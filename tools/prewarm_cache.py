"""Prewarm the decoded-crop cache (data/cache.py) and measure the speedup.

Usage (same dataset flags as cli.train):
    python tools/prewarm_cache.py --root simplebaseline/ours --name x \
        --num_our 20000 --dataset-root _data [--batch 256]

Runs entirely on the host (no TPU claim): epoch A fills the memmap through
the normal cv2 path, epoch B reads it back, and the printed rates are the
honest host-feed before/after for BASELINE.md. Run this BEFORE a training
job on the single-tenant box so epoch 1 of the real run starts fully
cached.
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never touch the TPU claim

from lighthand_tpu.config import parse_args  # noqa: E402
from lighthand_tpu.data.registry import build_dataset  # noqa: E402


def sweep(source, batch: int, label: str) -> float:
    t0 = time.monotonic()
    n = len(source)
    for lo in range(0, n, batch):
        source.getitems(range(lo, min(lo + batch, n)))
        done = min(lo + batch, n)
        if lo and lo % (batch * 16) == 0:
            rate = done / (time.monotonic() - t0)
            print(f"  {label}: {done}/{n} ({rate:.0f} samples/s)",
                  flush=True)
    dt = time.monotonic() - t0
    rate = n / dt
    print(f"{label}: {n} samples in {dt:.1f}s = {rate:.0f} samples/s",
          flush=True)
    return rate


def main():
    batch = 256
    argv = sys.argv[1:]
    if "--batch" in argv:
        i = argv.index("--batch")
        batch = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    cfg = parse_args(argv)
    for name, src in zip(("train", "val"), build_dataset(cfg)):
        kind = type(src).__name__
        print(f"{name}: {kind}, {len(src)} samples")
        # the frei/gan routes wrap the CachedSource in a SubsetSource
        # (random_split_90_10) — sweeping the subset still fills the
        # underlying memmap via SubsetSource.getitems forwarding
        inner = src
        while not hasattr(inner, "cache_dir") and hasattr(inner, "base"):
            inner = inner.base
        if not hasattr(inner, "cache_dir"):
            print("  (not cached — skipping)")
            continue
        print(f"  cache dir {inner.cache_dir}, "
              f"{inner.hit_fraction() * 100:.1f}% filled")
        fill = sweep(src, batch, f"{name} fill/verify pass")
        cached = sweep(src, batch, f"{name} cached pass")
        print(f"{name}: cached/fill speedup = {cached / fill:.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
