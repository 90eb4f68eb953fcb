"""Decoded-crop memmap cache (data/cache.py).

The cache exists because every source is deterministic per index
(SURVEY.md section 7; VERDICT r4 weak item 2: real-data training was
host-feed-bound at ~105 img/s with cv2 re-decoding every epoch). These
tests pin the lossless contract: cached bytes == base bytes, fills are
lazy, invalidation fires on config/tree change, meta-bearing sources are
left unwrapped.
"""

import json
import os

import numpy as np
import pytest

from lighthand_tpu.data.cache import CachedSource, maybe_cache
from lighthand_tpu.data.records import Sample, Source, SubsetSource


class CountingSource(Source):
    """Deterministic toy source that counts decode calls."""

    heatmap_style = "max"

    def __init__(self, n=12, size=32, kdim=2, with_meta=False):
        self.n, self.size, self.kdim = n, size, kdim
        self.with_meta = with_meta
        self.calls = 0

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        self.calls += 1
        rng = np.random.default_rng(idx)
        return Sample(
            image=rng.integers(0, 255, (self.size, self.size, 3), np.uint8),
            joints=rng.uniform(0, self.size, (21, self.kdim)).astype(
                np.float32),
            aug_enabled=idx % 2 == 0,
            noise_enabled=idx % 3 == 0,
            hm_max=idx % 5 == 0,
            meta={"pose_ctgy": "Standard"} if self.with_meta else None,
        )


def test_cache_roundtrip_and_lazy_fill(tmp_path):
    base = CountingSource()
    want = [base[i] for i in range(12)]
    base.calls = 0

    src = CachedSource(base, str(tmp_path / "c"), token="t1")
    assert src.heatmap_style == "max"
    assert len(src) == 12
    # constructor probes+stores row 0 exactly once
    assert base.calls == 1 and src.hit_fraction() == pytest.approx(1 / 12)

    got = src.getitems(range(12))
    assert base.calls == 12  # row 0 served from cache, 11 bulk-fetched
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w.image, g.image)
        np.testing.assert_array_equal(w.joints, g.joints)
        assert (w.aug_enabled, w.noise_enabled, w.hm_max) == \
            (g.aug_enabled, g.noise_enabled, g.hm_max)

    # second epoch: zero base decodes, identical bytes
    got2 = src.getitems(range(12))
    assert base.calls == 12 and src.hit_fraction() == 1.0
    np.testing.assert_array_equal(got[5].image, got2[5].image)


def test_cache_persists_across_instances(tmp_path):
    base = CountingSource()
    CachedSource(base, str(tmp_path / "c"), token="t1").getitems(range(12))
    calls = base.calls
    src2 = CachedSource(base, str(tmp_path / "c"), token="t1")
    s = src2[7]
    assert base.calls == calls  # constructor probe also served from cache
    np.testing.assert_array_equal(s.image, CountingSource()[7].image)


def test_cache_invalidates_on_token_change(tmp_path):
    base = CountingSource()
    CachedSource(base, str(tmp_path / "c"), token="t1").getitems(range(12))
    base.calls = 0
    src = CachedSource(base, str(tmp_path / "c"), token="t2")
    src.getitems(range(12))
    assert base.calls >= 12  # full rebuild


def test_cache_rejects_stale_meta_json(tmp_path):
    base = CountingSource()
    d = str(tmp_path / "c")
    CachedSource(base, d, token="t1")
    # truncate meta.json -> unreadable -> rebuild, not crash
    with open(os.path.join(d, "meta.json"), "w") as f:
        f.write("{bad")
    src = CachedSource(base, d, token="t1")
    assert src[3].image.shape == (32, 32, 3)


def test_maybe_cache_fingerprints_tree(tmp_path):
    anno = tmp_path / "anno.json"
    anno.write_text(json.dumps([1, 2, 3]))
    base = CountingSource()
    s1 = maybe_cache(base, str(tmp_path), "tok",
                     fingerprint_paths=[str(anno)])
    assert isinstance(s1, CachedSource)
    d1 = s1.cache_dir
    # same tree -> same cache dir; regenerated tree -> new dir
    s2 = maybe_cache(base, str(tmp_path), "tok",
                     fingerprint_paths=[str(anno)])
    assert s2.cache_dir == d1
    anno.write_text(json.dumps([1, 2, 3, 4]))
    os.utime(anno, ns=(1, 1))
    s3 = maybe_cache(base, str(tmp_path), "tok",
                     fingerprint_paths=[str(anno)])
    assert s3.cache_dir != d1


def test_maybe_cache_skips_meta_and_disabled(tmp_path):
    meta_src = CountingSource(with_meta=True)
    assert maybe_cache(meta_src, str(tmp_path), "tok") is meta_src
    plain = CountingSource()
    assert maybe_cache(plain, str(tmp_path), "tok",
                       enabled=False) is plain


def test_subset_getitems_forwards_to_base_bulk(tmp_path):
    base = CountingSource()
    cached = CachedSource(base, str(tmp_path / "c"), token="t1")
    sub = SubsetSource(cached, [3, 5, 7])
    got = sub.getitems([0, 2])
    np.testing.assert_array_equal(got[0].image, CountingSource()[3].image)
    np.testing.assert_array_equal(got[1].image, CountingSource()[7].image)
    # served from cache on second touch
    calls = base.calls
    sub.getitems([0, 2])
    assert base.calls == calls


def test_registry_wraps_lighthand(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    # minimal LightHand tree (mirrors test_dataset_sources.fake_lighthand)
    base = tmp_path / "LightHand"
    img_dir = base / "images" / "train"
    os.makedirs(img_dir)
    for phase, n in (("train", 6), ("eval", 4)):
        os.makedirs(base / "annotations" / phase)
        recs = []
        for i in range(n):
            p = str(img_dir / f"{phase}_{i}.jpg")
            cv2.imwrite(p, rng.integers(0, 255, (224, 224, 3), np.uint8))
            recs.append({"file_name": p,
                         "joint_2d": rng.uniform(10, 210, (21, 2)).tolist()})
        (base / "annotations" / phase /
         f"CISLAB_{phase}_data.json").write_text(json.dumps(recs))

    from lighthand_tpu.config import Config
    from lighthand_tpu.data.registry import build_dataset

    cfg = Config()
    cfg.data.dataset = "ours"
    cfg.data.dataset_root = str(tmp_path)
    cfg.data.num_our = 6
    cfg.eval.eval = False
    train, val = build_dataset(cfg)
    assert isinstance(train, CachedSource) and isinstance(val, CachedSource)
    raw_train, _ = build_dataset(
        Config(data=cfg.data.__class__(
            dataset="ours", dataset_root=str(tmp_path), num_our=6,
            cache_crops=False)))
    a, b = train.getitems(range(6)), raw_train.getitems(range(6))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.image, y.image)
        np.testing.assert_array_equal(x.joints, y.joints)
        assert x.aug_enabled == y.aug_enabled
