"""Offline eval harness: golden test of the AUC/EPE/PCK-curve math against
a literal NumPy transcription of pred_eval (argparser.py:326-388)."""

import json

import numpy as np

from lighthand_tpu.eval.harness import (
    _threshold_grid,
    dump,
    pred_eval,
    pred_test,
)


def _fake_store(rng, n_per_cat=25):
    cats = ["Standard", "Occlusion_by_Pinky", "Occlusion_by_Thumb",
            "Occlusion_by_Both"]
    meta = {}
    for c in cats:
        gt_xy = rng.uniform(30, 220, size=(n_per_cat, 21, 2))
        vis = (rng.uniform(size=(n_per_cat, 21, 1)) > 0.2).astype(float)
        gt = np.concatenate([gt_xy, vis], axis=-1)
        pred = gt_xy + rng.normal(scale=6.0, size=gt_xy.shape)
        bb = [float(np.sqrt((g[:, 0].max() - g[:, 0].min()) ** 2
                            + (g[:, 1].max() - g[:, 1].min()) ** 2))
              for g in gt_xy]
        meta[c] = {"bb": bb, "pred": pred.tolist(), "gt": gt.tolist()}
    return meta


def _golden_category(meta_cat, thresholds, method):
    """Literal transcription of the per-category body of pred_eval."""
    bbox = np.array(meta_cat["bb"])
    pred = np.array(meta_cat["pred"])
    gt = np.array(meta_cat["gt"])
    diff = np.sqrt(np.sum(np.square(gt[:, :, :2] - pred[:, :, :2]), axis=-1))
    norm_diff = diff / bbox[:, None].repeat(21, axis=1) if method == "pckb" \
        else diff
    mask = gt[:, :, -1] == 1
    visible = norm_diff[mask]
    total = len(visible)
    pck_t = np.array([(visible < t).sum() / total * 100 for t in thresholds])
    norm_factor = np.trapezoid(np.ones_like(thresholds), thresholds)
    auc = np.trapezoid(pck_t, thresholds) / norm_factor
    import sys

    return auc, diff.mean() / 3.7795275591, pck_t


def test_threshold_grids_match_reference():
    mm = _threshold_grid([0, 30], "mm")
    assert len(mm) == 100
    np.testing.assert_allclose(
        mm, np.linspace(0, 30, 101)[1:] * 2.83464567)
    pckb = _threshold_grid([0.1, 0.3], "pckb")
    assert len(pckb) == 100
    np.testing.assert_allclose(pckb, np.linspace(0.1, 0.3, 100))


def test_pred_eval_matches_golden(tmp_path, rng):
    meta = _fake_store(rng)
    path = str(tmp_path / "evaluation.json")
    dump(path, meta)
    # verify the reference's list-wrapped layout (dir.py:19-22)
    with open(path) as f:
        raw = json.load(f)
    assert isinstance(raw, list) and len(raw) == 1

    for method, t_list in [("pckb", [0.1, 0.3]), ("mm", [0, 30])]:
        out = pred_eval(path, t_list, method, compat_mean_epe=False)
        thresholds = _threshold_grid(t_list, method)
        for cat in meta:
            want_auc, want_epe, want_pck = _golden_category(
                meta[cat], thresholds, method)
            auc, epe, pck = out[cat][0], out[cat][1], np.array(out[cat][2])
            assert abs(auc - want_auc) < 1e-9
            assert abs(epe - want_epe) < 1e-9
            np.testing.assert_allclose(pck, want_pck)
        assert "mean_auc" in out


def test_pred_eval_compat_mean_epe_pads_zeros(tmp_path, rng):
    meta = _fake_store(rng, n_per_cat=10)
    path = str(tmp_path / "evaluation.json")
    dump(path, meta)
    compat = pred_eval(path, [0, 30], "mm", compat_mean_epe=True,
                       compat_rows=971)
    fixed = pred_eval(path, [0, 30], "mm", compat_mean_epe=False)
    # 40 real rows vs 971 zero rows -> compat mean EPE is much smaller
    assert compat["mean_auc"][1] < fixed["mean_auc"][1] * 0.1
    # per-category values are unaffected by the compat flag
    assert compat["Standard"][0] == fixed["Standard"][0]


def test_pred_test_flat(tmp_path, rng):
    gt = rng.uniform(30, 220, size=(3, 8, 21, 2))
    pred = gt + rng.normal(scale=4.0, size=gt.shape)
    meta = {
        "pred": [p.tolist() for p in pred],
        "gt": [g.tolist() for g in gt],
        "bb": [[100.0] * 8 for _ in range(3)],
    }
    path = str(tmp_path / "test.json")
    dump(path, meta)
    auc, epe = pred_test(path, [0, 30], "mm")
    assert 0 < auc <= 100
    diff = np.sqrt(((gt - pred) ** 2).sum(-1))
    assert abs(epe - diff.mean()) < 1e-9
