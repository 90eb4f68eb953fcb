"""Decoded-crop cache: memmap post-crop samples beside the dataset tree.

Why this exists: every source in this repo is DETERMINISTIC per index —
LightHand decodes + resizes fixed files (data/lighthand.py:75-86), FreiHAND
derives its rotation/scale aug from ``default_rng(seed*2_000_003 + idx)``
(data/freihand.py:138), and the RHD/GAN/InterHand crops are pure functions
of the annotation record. The reference hides the repeated cv2 cost in 8
fork()ed DataLoader workers (src/datasets/build.py:102, pre_argparser.py:16);
on this 1-host-core box neither forks nor threads help, and real-data
epochs are host-feed-bound at ~105 img/s while the device can sink ~1050
(BASELINE.md). Since item ``idx`` yields byte-identical output on every
epoch, the first touch can write the post-crop uint8 image + joints to a
memmap and every later epoch can skip decode/warp entirely.

Layout (``{cache_dir}/``):
  meta.json   {token, n, size, kdim, version} — config fingerprint; any
              mismatch (or absence) invalidates the whole cache
  images.u8   uint8 memmap [N, S, S, 3]
  joints.f32  float32 memmap [N, 21, K]   (K = 2 train / 3 with visibility)
  flags.u8    uint8 memmap [N, 3]         (aug_enabled, noise_enabled, hm_max)
  filled.u8   uint8 memmap [N]            (1 = row is valid)

meta.json is written LAST at creation, so a crash mid-setup leaves no
"valid" half-cache; a crash mid-fill at worst loses unflushed ``filled``
bits (those rows just re-decode). Rows are filled lazily by whichever
epoch touches them first; the Loader's worker threads write disjoint rows,
so no locking is needed beyond the GIL.

Sources that emit per-sample ``meta`` dicts (the Armo eval set) are not
cacheable — ``maybe_cache`` returns them unwrapped.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import List, Optional

import numpy as np

from lighthand_tpu.data.records import Sample, Source

_VERSION = 1


def _token_digest(token: str) -> str:
    return hashlib.sha256(token.encode()).hexdigest()[:16]


class CachedSource(Source):
    """Wrap a deterministic ``Source`` with a lazily-filled memmap cache."""

    def __init__(self, base: Source, cache_dir: str, token: str):
        self.base = base
        self.cache_dir = cache_dir
        self.heatmap_style = getattr(base, "heatmap_style", "msra")
        n = len(base)

        meta_path = os.path.join(cache_dir, "meta.json")
        have = None
        if os.path.isfile(meta_path):
            try:
                with open(meta_path) as f:
                    have = json.load(f)
            except (json.JSONDecodeError, OSError):
                have = None

        digest = _token_digest(token)
        probe = None
        if (have and have.get("token") == digest and have.get("n") == n
                and have.get("version") == _VERSION):
            # warm cache: trust the recorded shapes, skip the probe decode
            size, kdim = int(have["size"]), int(have["kdim"])
            want = have
        else:
            probe = base[0]
            if probe.meta:
                raise ValueError(
                    "CachedSource cannot wrap meta-bearing sources; "
                    "use maybe_cache() which skips them")
            size = int(probe.image.shape[0])
            kdim = int(probe.joints.shape[1])
            want = {"token": digest, "n": n, "size": size,
                    "kdim": kdim, "version": _VERSION}
        self._n, self._size, self._kdim = n, size, kdim

        if have != want:
            if os.path.isdir(cache_dir):
                shutil.rmtree(cache_dir)
            os.makedirs(cache_dir, exist_ok=True)
            # create zero-filled backing files (sparse on ext4: the 4 GB
            # image map costs disk only as rows actually fill)
            np.memmap(os.path.join(cache_dir, "images.u8"), np.uint8,
                      "w+", shape=(n, size, size, 3)).flush()
            np.memmap(os.path.join(cache_dir, "joints.f32"), np.float32,
                      "w+", shape=(n, 21, kdim)).flush()
            np.memmap(os.path.join(cache_dir, "flags.u8"), np.uint8,
                      "w+", shape=(n, 3)).flush()
            np.memmap(os.path.join(cache_dir, "filled.u8"), np.uint8,
                      "w+", shape=(n,)).flush()
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(want, f)
            os.replace(tmp, meta_path)  # meta last = cache now valid

        mode = "r+"
        self.images = np.memmap(os.path.join(cache_dir, "images.u8"),
                                np.uint8, mode, shape=(n, size, size, 3))
        self.joints = np.memmap(os.path.join(cache_dir, "joints.f32"),
                                np.float32, mode, shape=(n, 21, kdim))
        self.flags = np.memmap(os.path.join(cache_dir, "flags.u8"),
                               np.uint8, mode, shape=(n, 3))
        self.filled = np.memmap(os.path.join(cache_dir, "filled.u8"),
                                np.uint8, mode, shape=(n,))
        # reuse the probe decode instead of discarding it
        if probe is not None and not self.filled[0]:
            self._store(0, probe)

    # -- cache plumbing ---------------------------------------------------

    def _store(self, idx: int, s: Sample) -> None:
        self.images[idx] = s.image
        self.joints[idx] = s.joints
        self.flags[idx] = (s.aug_enabled, s.noise_enabled, s.hm_max)
        self.filled[idx] = 1  # last: readers only trust filled rows

    def _load(self, idx: int) -> Sample:
        f = self.flags[idx]
        return Sample(image=np.asarray(self.images[idx]),
                      joints=np.asarray(self.joints[idx]),
                      aug_enabled=bool(f[0]), noise_enabled=bool(f[1]),
                      hm_max=bool(f[2]))

    def hit_fraction(self) -> float:
        return float(np.mean(self.filled))

    # -- Source interface --------------------------------------------------

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int) -> Sample:
        idx = int(idx)
        if self.filled[idx]:
            return self._load(idx)
        s = self.base[idx]
        self._store(idx, s)
        return s

    def getitems(self, indices) -> List[Sample]:
        indices = [int(i) for i in indices]
        missing = [i for i in indices if not self.filled[i]]
        if missing:
            # one bulk fetch through the base (keeps the native TSV
            # bulk-read path hot on the fill epoch)
            for i, s in zip(missing, self.base.getitems(missing)):
                self._store(i, s)
        return [self._load(i) for i in indices]


def maybe_cache(source: Source, dataset_root: str, token: str,
                enabled: bool = True,
                fingerprint_paths: Optional[List[str]] = None) -> Source:
    """Wrap ``source`` in a CachedSource under ``{dataset_root}/.lh_cache/``.

    ``token`` should capture every config knob that changes sample bytes
    (dataset name, phase, image_size, num_our, aug ratio, seed).
    ``fingerprint_paths``: annotation/shard files whose mtime+size get mixed
    into the token, so regenerating a tree invalidates its cache.
    Returns ``source`` unchanged when disabled, the source is synthetic-less
    tiny, it emits meta dicts, or the cache dir is unwritable.
    """
    if not enabled or len(source) == 0:
        return source
    try:
        if source[0].meta:
            return source
    except Exception:
        return source
    for p in fingerprint_paths or []:
        try:
            st = os.stat(p)
            token += f"|{p}:{st.st_mtime_ns}:{st.st_size}"
        except OSError:
            token += f"|{p}:absent"
    cache_dir = os.path.join(dataset_root, ".lh_cache", _token_digest(token))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        return CachedSource(source, cache_dir, token)
    except (OSError, ValueError):
        return source
