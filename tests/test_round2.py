"""Round-2 wiring tests: per-dataset augmentation/target routing, ragged
tails (scan dispatch + validation padding), flip aug, native bulk reads,
TSV aux generators, and the 3D metric surface."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from tests.golden import golden_generate_heatmap_max, golden_generate_target


# ---------------------------------------------------------------------------
# augmentation routing
# ---------------------------------------------------------------------------

def test_channel_pixel_noise_gating(rng):
    from lighthand_tpu.ops.color import channel_pixel_noise

    img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    noised = channel_pixel_noise(key, img, enable=1.0)
    off = channel_pixel_noise(key, img, enable=0.0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(img), atol=1e-7)
    assert not np.allclose(np.asarray(noised), np.asarray(img))
    # reference semantics (frei_dataloader.py:142-144): per-channel scalar
    # multiply + clip — every channel scaled by ONE factor
    ratio = np.asarray(noised) / np.maximum(np.asarray(img), 1e-6)
    unclipped = np.asarray(noised) < 1.0 - 1e-6
    for c in range(3):
        vals = ratio[..., c][unclipped[..., c]]
        assert vals.std() < 1e-4  # constant per channel
        assert 0.6 - 1e-4 <= vals.mean() <= 1.4 + 1e-4


def test_make_targets_max_routing_matches_golden(rng):
    from lighthand_tpu.train.step import make_targets

    joints = rng.uniform(4, 250, size=(3, 21, 2)).astype(np.float32)
    got = np.asarray(make_targets(jnp.asarray(joints), style="max",
                                  heatmap_size=64, stride=4.0))
    for b in range(3):
        want = golden_generate_heatmap_max(joints[b] / 4.0, 64, 21)
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_make_targets_per_sample_select(rng):
    from lighthand_tpu.train.step import make_targets

    joints = rng.uniform(4, 250, size=(2, 21, 2)).astype(np.float32)
    hm_max = jnp.asarray([1.0, 0.0])
    got = np.asarray(make_targets(jnp.asarray(joints), style="per_sample",
                                  heatmap_size=64, stride=4.0,
                                  hm_max=hm_max))
    np.testing.assert_allclose(
        got[0], golden_generate_heatmap_max(joints[0] / 4.0, 64, 21),
        atol=1e-5)
    np.testing.assert_allclose(
        got[1], golden_generate_target(joints[1], 64, 4.0, 2.0)[0],
        atol=1e-5)


def test_source_heatmap_styles():
    from lighthand_tpu.data.records import (
        ConcatSource,
        Source,
        SubsetSource,
        source_heatmap_styles,
    )

    class A(Source):
        def __len__(self):
            return 4

    class B(Source):
        heatmap_style = "max"

        def __len__(self):
            return 4

    assert source_heatmap_styles(A()) == {"msra"}
    assert source_heatmap_styles(SubsetSource(B(), [0, 1])) == {"max"}
    assert source_heatmap_styles(ConcatSource(A(), B())) == {"msra", "max"}


def test_fused_step_consumes_noise_and_styles(rng):
    """The fused train step runs with the full round-2 batch schema:
    jitter + channel noise gates and per-sample target styles."""
    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state
    from lighthand_tpu.train.step import make_fused_train_step

    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3), lr=1e-3)
    step = make_fused_train_step(heatmap_size=16, stride=4.0, jitter=True,
                                 scan_steps=1, target_style="per_sample")
    batch = {
        "image_u8": jnp.asarray(rng.integers(
            0, 255, size=(4, 64, 64, 3), dtype=np.uint8)),
        "joints": jnp.asarray(
            rng.uniform(8, 56, size=(4, 21, 2)).astype(np.float32)),
        "aug_enabled": jnp.asarray([1.0, 0.0, 0.0, 0.0]),
        "noise_enabled": jnp.asarray([0.0, 1.0, 0.0, 0.0]),
        "hm_max": jnp.asarray([0.0, 0.0, 1.0, 0.0]),
    }
    state, m = step(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(m["loss"]))


def test_frei_sample_routes_noise_not_jitter(tmp_path, rng):
    from lighthand_tpu.data.freihand import FreiHandTSVDataset
    from lighthand_tpu.data.tsv import img_to_base64, tsv_writer

    img_rows, label_rows = [], []
    for i in range(3):
        img = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        img_rows.append([f"img{i}", img_to_base64(img)])
        anno = {"center": [112.0, 112.0], "scale": 1.12,
                "2d_joints": rng.uniform(40, 180, size=(21, 3)).tolist()}
        label_rows.append([f"img{i}", json.dumps([anno])])
    tsv_writer(img_rows, str(tmp_path / "t.img.tsv"))
    tsv_writer(label_rows, str(tmp_path / "t.label.tsv"))
    (tmp_path / "t.yaml").write_text(yaml.safe_dump(
        {"img": "t.img.tsv", "label": "t.label.tsv"}))

    ds = FreiHandTSVDataset(str(tmp_path / "t.yaml"), is_train=True)
    s = ds[0]
    assert s.noise_enabled and not s.aug_enabled  # frei: noise, no jitter
    ds_eval = FreiHandTSVDataset(str(tmp_path / "t.yaml"), is_train=False)
    s = ds_eval[0]
    assert not s.noise_enabled and not s.aug_enabled

    # bulk getitems == per-item getitem
    bulk = ds_eval.getitems([2, 0])
    np.testing.assert_array_equal(bulk[0].image, ds_eval[2].image)
    np.testing.assert_array_equal(bulk[1].joints, ds_eval[0].joints)


# ---------------------------------------------------------------------------
# flip augmentation
# ---------------------------------------------------------------------------

def test_hflip_px_involution(rng):
    from lighthand_tpu.ops.affine import hflip_px

    imgs = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    joints = jnp.asarray(rng.uniform(0, 15, size=(3, 21, 2))
                         .astype(np.float32))
    mask = jnp.asarray([True, False, True])
    i1, j1 = hflip_px(imgs, joints, mask)
    i2, j2 = hflip_px(i1, j1, mask)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(imgs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j2), np.asarray(joints), atol=1e-5)
    # unflipped row untouched
    np.testing.assert_array_equal(np.asarray(i1[1]), np.asarray(imgs[1]))
    # flipped row: x' = W-1-x, image mirrored
    np.testing.assert_allclose(np.asarray(j1[0, :, 0]),
                               15.0 - np.asarray(joints[0, :, 0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1[0]),
                                  np.asarray(imgs[0])[:, ::-1])


# ---------------------------------------------------------------------------
# ragged tails: loader padding + eval masking + scan-dispatch flush
# ---------------------------------------------------------------------------

def test_loader_pads_ragged_tail_with_valid_mask():
    from lighthand_tpu.data.pipeline import Loader
    from lighthand_tpu.data.synthetic import SyntheticHands

    src = SyntheticHands(length=10, size=32)
    loader = Loader(src, 4, mesh=None, num_workers=2, drop_last=False)
    assert len(loader) == 3
    batches = list(loader)
    assert all(b["image_u8"].shape[0] == 4 for b in batches)
    valid = np.concatenate([np.asarray(b["valid"]) for b in batches])
    assert valid.sum() == 10 and valid[:10].all() and not valid[10:].any()


def test_eval_step_masks_padding(rng):
    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state, make_eval_step

    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3))
    step = make_eval_step(heatmap_size=16, stride=4.0)
    imgs = rng.normal(size=(4, 64, 64, 3)).astype(np.float32)
    joints = rng.uniform(8, 56, size=(4, 21, 2)).astype(np.float32)
    # pad rows 2,3 with copies of row 1, valid=0
    imgs[2], imgs[3] = imgs[1], imgs[1]
    joints[2], joints[3] = joints[1], joints[1]
    m_masked = step(state, {"image": jnp.asarray(imgs),
                            "joints": jnp.asarray(joints),
                            "valid": jnp.asarray([1.0, 1.0, 0.0, 0.0])})
    m_ref = step(state, {"image": jnp.asarray(imgs[:2]),
                         "joints": jnp.asarray(joints[:2])})
    assert float(m_masked["n_valid"]) == 2.0
    np.testing.assert_allclose(float(m_masked["loss"]),
                               float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_masked["pck_sum"]),
                               float(m_ref["pck_sum"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_masked["epe_sum"]),
                               float(m_ref["epe_sum"]), rtol=1e-5)


def test_trainer_flushes_scan_tail(tmp_path):
    """steps_per_dispatch=2 with 3 loader batches: the 3rd batch must
    train (the old dispatcher silently dropped it)."""
    from lighthand_tpu.config import Config
    from lighthand_tpu.train.loop import Trainer

    cfg = Config(name="resnet18/ours/tailtest", root_path=str(tmp_path))
    cfg.model.name = "resnet18"
    cfg.model.precision = "f32"
    cfg.data.dataset = "ours"
    cfg.data.synthetic = True
    cfg.data.image_size = 64
    cfg.data.heatmap_size = 16
    cfg.data.batch_size = 8
    cfg.data.num_our = 24          # -> 24 samples = 3 batches of 8
    cfg.data.num_workers = 2
    cfg.train.epochs = 1
    cfg.train.steps_per_dispatch = 2
    cfg.train.visualize = False
    cfg.output_dir = os.path.join(str(tmp_path), cfg.name)
    cfg.tensorboard_dir = os.path.join(str(tmp_path), "tb")

    trainer = Trainer(cfg)
    train_loader, _ = trainer.make_loaders()
    assert len(train_loader) == 3
    loss, _ = trainer.run_train_epoch(train_loader, epoch=0)
    assert np.isfinite(loss)
    assert trainer._last_epoch_images == 24  # 2 scanned + 1 flushed batch


# ---------------------------------------------------------------------------
# native bulk reads + TSV aux generators
# ---------------------------------------------------------------------------

def test_tsvfile_read_rows_bulk(tmp_path):
    from lighthand_tpu.data.tsv import TSVFile, tsv_writer

    rows = [[f"k{i}", f"val{i}", "x" * (i % 7)] for i in range(20)]
    path = str(tmp_path / "bulk.tsv")
    tsv_writer(rows, path)
    tsv = TSVFile(path)
    got = tsv.read_rows([19, 0, 7, 7])
    assert got == [rows[19], rows[0], rows[7], rows[7]]


def test_generate_hw_and_linelist_files(tmp_path, rng):
    from lighthand_tpu.data.tsv import (
        generate_hw_file,
        generate_linelist_file,
        img_to_base64,
        tsv_reader,
        tsv_writer,
    )

    img_rows = []
    for i, (h, w) in enumerate([(32, 48), (64, 16)]):
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        img_rows.append([f"k{i}", img_to_base64(img)])
    img_path = str(tmp_path / "a.img.tsv")
    tsv_writer(img_rows, img_path)
    hw_path = generate_hw_file(img_path)
    hw = list(tsv_reader(hw_path))
    assert json.loads(hw[0][1]) == [{"height": 32, "width": 48}]
    assert json.loads(hw[1][1]) == [{"height": 64, "width": 16}]

    label_rows = [
        ["k0", json.dumps([{"cls": "hand"}])],
        ["k1", json.dumps([])],                      # empty -> dropped
        ["k2", json.dumps([{"cls": "hand", "ignore": 1}])],
        ["k3", json.dumps([{"cls": "hand", "ignore": 0}])],
    ]
    label_path = str(tmp_path / "a.label.tsv")
    tsv_writer(label_rows, label_path)
    ll = [int(r[0]) for r in tsv_reader(generate_linelist_file(label_path))]
    assert ll == [0, 2, 3]
    ll2 = [int(r[0]) for r in tsv_reader(generate_linelist_file(
        label_path, str(tmp_path / "ign.tsv"), ignore_attrs=("ignore",)))]
    assert ll2 == [0, 3]


def test_img_from_base64_native_matches_python(tmp_path, rng):
    from lighthand_tpu.data.tsv import img_from_base64, img_to_base64

    img = rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
    b64 = img_to_base64(img)
    out = img_from_base64(b64)
    assert out is not None and out.shape == (24, 24, 3)
    assert img_from_base64("!!!notbase64$$") is None


# ---------------------------------------------------------------------------
# 3D metric surface (golden: literal transcription of loss.py:205-236,69-80)
# ---------------------------------------------------------------------------

def test_pck_3d_matches_reference_math(rng):
    from lighthand_tpu.ops.metrics import pck_3d

    pred = rng.normal(size=(4, 21, 3)).astype(np.float32)
    gt = pred + rng.normal(scale=0.02, size=(4, 21, 3)).astype(np.float32)
    pck, t = pck_3d(jnp.asarray(pred), jnp.asarray(gt), t=0.1)
    dist = np.sqrt(((pred - gt) ** 2).sum(2))
    want = (dist * 3.779527559 <= 0.1).mean()
    np.testing.assert_allclose(float(pck), want, atol=1e-6)
    assert t == 0.1


def test_keypoint_2d_loss_visibility_mask(rng):
    from lighthand_tpu.ops.metrics import keypoint_2d_loss

    pred = rng.normal(size=(2, 21, 2)).astype(np.float32)
    gt = rng.normal(size=(2, 21, 3)).astype(np.float32)
    gt[..., 2] = (rng.uniform(size=(2, 21)) > 0.5).astype(np.float32)
    got = float(keypoint_2d_loss(jnp.asarray(pred), jnp.asarray(gt)))
    err = (pred - gt[..., :2]) ** 2 * gt[..., 2][..., None]
    want = err[err > 0].mean()  # reference loss.py:76 loss[loss>0].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # no visibility column -> plain MSE
    got2 = float(keypoint_2d_loss(jnp.asarray(pred),
                                  jnp.asarray(gt[..., :2])))
    np.testing.assert_allclose(got2, ((pred - gt[..., :2]) ** 2).mean(),
                               rtol=1e-6)


def test_keypoint_3d_loss(rng):
    from lighthand_tpu.ops.metrics import keypoint_3d_loss

    pred = rng.normal(size=(2, 21, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 21, 3)).astype(np.float32)
    np.testing.assert_allclose(
        float(keypoint_3d_loss(jnp.asarray(pred), jnp.asarray(gt))),
        ((pred - gt) ** 2).mean(), rtol=1e-6)
    with pytest.raises(ValueError):
        keypoint_3d_loss(jnp.zeros((0, 21, 3)), jnp.zeros((0, 21, 3)))


# ---------------------------------------------------------------------------
# checkpoint marker / config_iteration
# ---------------------------------------------------------------------------

def test_last_checkpoint_marker(tmp_path):
    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state
    from lighthand_tpu.train.checkpoint import save_checkpoint
    from lighthand_tpu.utils.misc import config_iteration

    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3))
    out = str(tmp_path / "run")
    os.makedirs(out)
    save_checkpoint(state, out, epoch=7, best_loss=0.5, count=2)
    assert config_iteration(out) == 7


def test_rotate_px_batch_consistency(rng):
    """A bright dot must land at the forward-rotated joint position."""
    from lighthand_tpu.ops.affine import rotate_px_batch

    b, s = 2, 64
    imgs = np.zeros((b, s, s, 3), np.float32)
    pts = np.array([[40.0, 20.0], [12.0, 50.0]], np.float32)
    for i in range(b):
        imgs[i, int(pts[i, 1]), int(pts[i, 0])] = 1.0
    joints = np.tile(pts[:, None, :], (1, 21, 1))
    deg = jnp.asarray([30.0, -45.0])
    out, jr = rotate_px_batch(jnp.asarray(imgs), jnp.asarray(joints), deg)
    out = np.asarray(out)
    jr = np.asarray(jr)
    for i in range(b):
        yy, xx = np.unravel_index(np.argmax(out[i, ..., 0]), (s, s))
        assert abs(xx - jr[i, 0, 0]) <= 1.0 and abs(yy - jr[i, 0, 1]) <= 1.0
    # zero rotation is identity
    out0, j0 = rotate_px_batch(jnp.asarray(imgs), jnp.asarray(joints),
                               jnp.zeros(b))
    np.testing.assert_allclose(np.asarray(out0), imgs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j0), joints, atol=1e-5)


def test_fused_step_rotation_aug(rng):
    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state
    from lighthand_tpu.train.step import make_fused_train_step

    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3), lr=1e-3)
    step = make_fused_train_step(heatmap_size=16, stride=4.0, jitter=False,
                                 scan_steps=1, rot_deg=30.0, flip=True)
    batch = {
        "image_u8": jnp.asarray(rng.integers(
            0, 255, size=(4, 64, 64, 3), dtype=np.uint8)),
        "joints": jnp.asarray(
            rng.uniform(16, 48, size=(4, 21, 2)).astype(np.float32)),
        "aug_enabled": jnp.zeros(4),
        "noise_enabled": jnp.zeros(4),
    }
    state, m = step(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(m["loss"]))


def test_cpu_prng_key_stays_on_host():
    """Host-side keys must live on the CPU device: through the remote TPU
    tunnel a PRNGKey/split on the default device is a round trip per call
    (and a hang when the tunnel's RNG stream wedges)."""
    from lighthand_tpu.core.prng import cpu_prng_key, host_split

    k = cpu_prng_key(42)
    assert all(d.platform == "cpu" for d in k.devices())
    a, b = host_split(k)
    assert all(d.platform == "cpu" for d in a.devices())
    assert not np.array_equal(np.asarray(a), np.asarray(b))
