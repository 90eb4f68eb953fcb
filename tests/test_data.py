import numpy as np
import jax
import jax.numpy as jnp

from lighthand_tpu.config import Config
from lighthand_tpu.data import Loader, DevicePreprocessor, build_dataset
from lighthand_tpu.data.records import ConcatSource, random_split_90_10
from lighthand_tpu.data.synthetic import SyntheticHands
from lighthand_tpu.data.tsv import (
    TSVFile,
    generate_lineidx,
    img_from_base64,
    img_to_base64,
    tsv_writer,
)


def test_synthetic_shapes():
    ds = SyntheticHands(length=8, size=128, aug_ratio=0.5)
    s = ds[0]
    assert s.image.shape == (128, 128, 3) and s.image.dtype == np.uint8
    assert s.joints.shape == (21, 2)
    assert ds[0].aug_enabled and not ds[7].aug_enabled
    # deterministic by index
    np.testing.assert_array_equal(ds[3].image, ds[3].image)


def test_random_split_90_10():
    ds = SyntheticHands(length=100, size=32)
    tr, va = random_split_90_10(ds)
    assert len(tr) == 90 and len(va) == 10
    assert set(tr.indices).isdisjoint(va.indices)


def test_concat_source():
    a = SyntheticHands(length=5, size=32, seed=1)
    b = SyntheticHands(length=7, size=32, seed=2)
    c = ConcatSource(a, b)
    assert len(c) == 12
    np.testing.assert_array_equal(c[5].image, b[0].image)
    np.testing.assert_array_equal(c[4].image, a[4].image)


def test_loader_batches():
    ds = SyntheticHands(length=20, size=64)
    loader = Loader(ds, batch_size=8, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b["image_u8"].shape == (8, 64, 64, 3)
        assert b["joints"].shape == (8, 21, 2)


def test_loader_epoch_reshuffle():
    ds = SyntheticHands(length=16, size=32)
    loader = Loader(ds, batch_size=16, shuffle=True, num_workers=1)
    loader.set_epoch(0)
    b0 = next(iter(loader))
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.allclose(np.asarray(b0["joints"]), np.asarray(b1["joints"]))


def test_device_preprocessor_normalizes():
    pre = DevicePreprocessor(jitter=True)
    imgs = jnp.full((2, 32, 32, 3), 128, jnp.uint8)
    out = pre(jax.random.PRNGKey(0), imgs, jnp.asarray([0.0, 0.0]))
    # no jitter for disabled samples: exact ImageNet normalize of 128/255
    want = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    # output is bf16 (the model's compute dtype)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]).astype(np.float32),
                               want, atol=2e-2)
    # jitter-enabled sample differs (generically)
    out2 = pre(jax.random.PRNGKey(0), imgs, jnp.asarray([1.0, 1.0]))
    assert not np.allclose(np.asarray(out2), np.asarray(out))


def test_tsv_roundtrip(tmp_path, rng):
    rows = [["key%d" % i, "meta%d" % i, "payload-%d" % (i * i)]
            for i in range(10)]
    path = str(tmp_path / "data.tsv")
    tsv_writer(rows, path)
    tsv = TSVFile(path)
    assert tsv.num_rows() == 10
    assert tsv[3] == rows[3]
    assert tsv.get_key(7) == "key7"
    # lineidx regeneration matches
    import os

    os.remove(str(tmp_path / "data.lineidx"))
    generate_lineidx(path)
    tsv2 = TSVFile(path)
    assert tsv2[9] == rows[9]


def test_base64_image_roundtrip():
    # smooth gradient: JPEG round-trips it nearly losslessly (random noise
    # would stress chroma subsampling, not the codec plumbing under test)
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([yy * 8, xx * 8, (yy + xx) * 4], -1).astype(np.uint8)
    s = img_to_base64(img, quality=100)
    back = img_from_base64(s)
    assert back.shape == (32, 32, 3)
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 4


def test_build_dataset_synthetic_fallback():
    cfg = Config(name="simplebaseline/ours/test")
    cfg.data.synthetic = True
    cfg.finalize()
    train, val = build_dataset(cfg)
    assert len(train) > 0 and len(val) > 0
    s = train[0]
    assert s.image.shape == (256, 256, 3)


def test_build_dataset_mix():
    cfg = Config(name="simplebaseline/mix/test")
    cfg.data.synthetic = True
    cfg.finalize()
    train, val = build_dataset(cfg)
    # three synthetic sub-datasets concatenated
    assert len(train) == 3 * 2048
    assert len(val) == 3 * 256


def test_build_dataset_validates_names():
    import pytest

    cfg = Config(name="nonsense/ours/x")
    with pytest.raises(ValueError):
        cfg.finalize()
    cfg2 = Config(name="hrnet/nodataset/x")
    with pytest.raises(ValueError):
        cfg2.finalize()
