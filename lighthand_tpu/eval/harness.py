"""Offline evaluation harness: prediction store + PCK/AUC/EPE curves with
per-occlusion-category breakdown.

Reference: pred_store/pred_eval/pred_store_test/pred_test
(src/utils/argparser.py:246-438) and the wearable_eval_2d CLI
(src/tools/wearable_eval_2d.py:23-85). Constants reproduced exactly
(BASELINE.md): mm threshold grids use linspace(T0,T1,101)[1:] * 2.83464567
(eval set) / * 3.7795275591 (test), pckb uses linspace(T0,T1,100); AUC is
trapezoid-integrated and normalized by the threshold range; EPE is reported
in mm as px / 3.7795275591.

Inference runs as a jitted predict step on device; only the final decoded
joints come back to the host. JSON artifacts keep the reference layout:
``dump`` wraps the payload in a single-element list and ``pred_eval`` reads
``meta[0]`` (dir.py:19-22, argparser.py:334).

``compat_mean_epe=True`` replicates a reference quirk: the all-category
"mean_auc" EPE concatenates the per-category errors onto a zero-initialized
[971, 21] array (argparser.py:345,367), deflating the reported mean by the
971 zero rows. The paper's numbers come from this code path, so compat is
the default; pass False for the corrected statistic.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from lighthand_tpu.data.armo import POSE_CATEGORIES
from lighthand_tpu.ops.metrics import (
    MM_THRESH_SCALE_EVAL,
    PX_TO_MM_EVAL,
)


def dump(path: str, payload) -> None:
    """JSON dump wrapped in a list (reference dir.py:13-22).

    Host-leader gated: in a multi-process run every host computes the same
    payload but only process 0 touches the (shared) filesystem."""
    from lighthand_tpu.core.mesh import is_host_leader

    if not is_host_leader():
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump([payload], f)


def _local_rows(x) -> np.ndarray:
    """Process-local rows of a (possibly multi-process global) batch array,
    in row order. Replicated shards are deduplicated by row offset."""
    if hasattr(x, "addressable_shards"):
        shards = {}
        for s in x.addressable_shards:
            start = s.index[0].start if s.index else 0
            shards[start or 0] = np.asarray(s.data)
        return np.concatenate([shards[k] for k in sorted(shards)], axis=0)
    return np.asarray(x)


def _gather_rows(tree: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Concatenate per-process row blocks from every host (the TPU-native
    replacement for the reference's pickle-over-NCCL comm.all_gather,
    src/utils/comm.py:104-144). Identity in a single-process run."""
    import jax

    if jax.process_count() == 1:
        return tree
    from lighthand_tpu.parallel import all_gather_metrics

    gathered = all_gather_metrics(tree)
    # process_allgather stacks a leading process axis; flatten it back
    return {k: np.concatenate(list(np.asarray(v)), axis=0)
            for k, v in gathered.items()}


def pred_store(loader, predict_fn, out_path: str,
               preprocess=None, rng_key=None,
               overlay_dir: str | None = None,
               overlay_max: int | None = None) -> Dict:
    """Run inference over the (Armo) eval loader and bucket
    {bbox_diag, pred, gt} per pose category (argparser.py:246-281).

    ``predict_fn(images) -> pred_joints [B,21,2]`` (already x4 to image
    space). ``loader`` yields device batches with joints [B,21,3] and meta
    categories list. ``overlay_dir`` saves GT/pred overlays per sample
    (the reference's --plt path, argparser.py:304-309); ``overlay_max``
    caps how many are written (None = every sample, the reference
    behavior — ~1k matplotlib JPEGs on the Armo set, which is slow on a
    1-core host; ``--plt_max N`` keeps the first N).

    Multi-process: each host accumulates its local rows; the blocks are
    all-gathered at the end so every host returns the full store.
    """
    import jax

    preds, gts, valids, cat_idx = [], [], [], []
    sample_idx = 0
    for batch in loader:
        images_u8 = batch["image_u8"]
        if preprocess is not None:
            from lighthand_tpu.core.prng import host_split

            rng_key, key = host_split(rng_key)
            images = preprocess(
                key, images_u8,
                np.zeros(images_u8.shape[0], np.float32))
        else:
            images = images_u8
        pred = _local_rows(predict_fn(images))
        gt = _local_rows(batch["joints"])  # [B,21,3] with visibility
        valid = _local_rows(batch.get("valid", np.ones(gt.shape[0])))
        cats = batch.get("pose_ctgy", ["Standard"] * gt.shape[0])
        preds.append(pred)
        gts.append(gt)
        valids.append(valid)
        cat_idx.append(np.asarray([POSE_CATEGORIES.index(c) for c in cats],
                                  np.int32))

        if overlay_dir is not None:
            from lighthand_tpu.core.mesh import is_host_leader
            from lighthand_tpu.utils.visualize import save_overlay

            if is_host_leader():
                imgs = _local_rows(images)
                for i in range(gt.shape[0]):
                    if valid[i]:
                        if overlay_max is None or sample_idx < overlay_max:
                            save_overlay(
                                imgs[i].astype(np.float32), gt[i], pred[i],
                                overlay_dir, "eval", 0, sample_idx)
                        sample_idx += 1

    rows = _gather_rows({
        "pred": np.concatenate(preds),
        "gt": np.concatenate(gts),
        "valid": np.concatenate(valids),
        "cat": np.concatenate(cat_idx),
    })

    meta = {c: {"bb": [], "pred": [], "gt": []} for c in POSE_CATEGORIES}
    for i in range(rows["gt"].shape[0]):
        if not rows["valid"][i]:
            continue  # padding row of the final partial batch
        gt_i = rows["gt"][i]
        w = gt_i[:, 0].max() - gt_i[:, 0].min()
        h = gt_i[:, 1].max() - gt_i[:, 1].min()
        cat = POSE_CATEGORIES[int(rows["cat"][i])]
        meta[cat]["bb"].append(float(np.sqrt(w**2 + h**2)))
        meta[cat]["pred"].append(rows["pred"][i].tolist())
        meta[cat]["gt"].append(gt_i.tolist())

    dump(out_path, meta)
    return meta


def _threshold_grid(t_list: Sequence[float], method: str) -> np.ndarray:
    if method == "mm":
        return np.linspace(t_list[0], t_list[-1], 101)[1:] * MM_THRESH_SCALE_EVAL
    if method == "pckb":
        return np.linspace(t_list[0], t_list[-1], 100)
    raise ValueError(f"method must be mm|pckb, got {method}")


def pred_eval(eval_json_path: str, t_list: Sequence[float], method: str,
              compat_mean_epe: bool = True,
              compat_rows: int = 971) -> Dict[str, list]:
    """Per-category + mean AUC / EPE(mm) / PCK curve (argparser.py:326-388).

    Returns {category: [auc, epe_mm, pck_curve(list)], ..., 'mean_auc': [...]}.
    """
    with open(eval_json_path) as f:
        meta = json.load(f)[0]

    thresholds = _threshold_grid(t_list, method)
    norm_factor = np.trapezoid(np.ones_like(thresholds), thresholds)
    eps = np.finfo(float).tiny

    total_pck = np.empty((0,))
    total_epe = (np.zeros((compat_rows, 21)) if compat_mean_epe
                 else np.zeros((0, 21)))
    out: Dict[str, list] = {}

    for p_type, rec in meta.items():
        if not rec["gt"]:
            # category with no samples (possible with partial eval sets;
            # the real Armo set populates all four)
            continue
        bbox = np.asarray(rec["bb"], dtype=float)
        pred = np.asarray(rec["pred"], dtype=float)
        gt = np.asarray(rec["gt"], dtype=float)

        diff = np.sqrt(((gt[:, :, :2] - pred[:, :, :2]) ** 2).sum(-1))
        if method == "pckb":
            norm_diff = diff / bbox[:, None]
        else:
            norm_diff = diff
        vis = gt[:, :, -1] == 1
        visible_diff = norm_diff[vis]

        total_epe = np.concatenate([total_epe, diff], axis=0)
        total_pck = np.concatenate([visible_diff, total_pck])

        total = len(visible_diff)
        pck_t = np.array(
            [(visible_diff < t).sum() / total * 100 for t in thresholds]
        )
        auc = np.trapezoid(pck_t, thresholds) / (norm_factor + eps)
        out[p_type] = [float(auc), float(diff.mean() / PX_TO_MM_EVAL),
                       pck_t.tolist()]

    total = len(total_pck)
    pck_t = np.array([(total_pck < t).sum() / total * 100 for t in thresholds])
    auc = np.trapezoid(pck_t, thresholds) / (norm_factor + eps)
    out["mean_auc"] = [float(auc), float(total_epe.mean() / PX_TO_MM_EVAL),
                       pck_t.tolist()]
    return out


def pred_store_test(loader, predict_fn, out_path: str,
                    preprocess=None, rng_key=None) -> Dict:
    """Flat variant without categories (argparser.py:284-323)."""
    import jax

    preds, gts, valids = [], [], []
    for batch in loader:
        images_u8 = batch["image_u8"]
        if preprocess is not None:
            from lighthand_tpu.core.prng import host_split

            rng_key, key = host_split(rng_key)
            images = preprocess(
                key, images_u8, np.zeros(images_u8.shape[0], np.float32))
        else:
            images = images_u8
        preds.append(_local_rows(predict_fn(images))[..., :2])
        gt = _local_rows(batch["joints"])[..., :2]
        gts.append(gt)
        valids.append(_local_rows(batch.get("valid",
                                            np.ones(gt.shape[0]))))
    rows = _gather_rows({"pred": np.concatenate(preds),
                         "gt": np.concatenate(gts),
                         "valid": np.concatenate(valids)})
    keep = rows["valid"] > 0
    pred, gt = rows["pred"][keep], rows["gt"][keep]
    bb = [float(np.sqrt((gt[i, :, 0].max() - gt[i, :, 0].min()) ** 2
                        + (gt[i, :, 1].max() - gt[i, :, 1].min()) ** 2))
          for i in range(gt.shape[0])]
    meta = {"pred": [pred.tolist()], "gt": [gt.tolist()], "bb": [bb]}
    dump(out_path, meta)
    return meta


def pred_test(test_json_path: str, t_list: Sequence[float],
              method: str) -> Tuple[float, float]:
    """(auc, mean_epe_px) over the flat store (argparser.py:391-438);
    mm grid here scales by 3.7795275591 (argparser.py:399)."""
    with open(test_json_path) as f:
        meta = json.load(f)[0]

    if method == "mm":
        thresholds = np.linspace(t_list[0], t_list[-1], 101)[1:] * PX_TO_MM_EVAL
    elif method == "pckb":
        thresholds = np.linspace(t_list[0], t_list[-1], 100)
    else:
        raise ValueError(method)
    norm_factor = np.trapezoid(np.ones_like(thresholds), thresholds)

    bbox = np.concatenate([np.asarray(b, dtype=float)
                           for b in meta["bb"]])
    gt = np.concatenate([np.asarray(g, dtype=float) for g in meta["gt"]])
    pred = np.concatenate([np.asarray(p, dtype=float) for p in meta["pred"]])

    diff = np.sqrt(((gt - pred) ** 2).sum(-1))
    norm_diff = diff / bbox[:, None] if method == "pckb" else diff
    norm_diff = norm_diff.flatten()
    total = len(norm_diff)
    pck_t = np.array([(norm_diff < t).sum() / total * 100
                      for t in thresholds])
    auc = np.trapezoid(pck_t, thresholds) / (norm_factor +
                                             np.finfo(float).tiny)
    return float(auc), float(diff.mean())
