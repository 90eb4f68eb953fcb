"""Host->device input pipeline.

The reference hides preprocessing cost in 8 fork()ed DataLoader workers that
each run cv2 + Python heatmap rasterization and return CPU tensors copied
H2D every step (train.py:27-38, method.py:165-166). Here:

- host threads only decode/collate uint8 images + joint arrays (cheap,
  GIL-friendly numpy);
- batches are transferred once, ahead of time, with the proper
  ``NamedSharding`` (double-buffered prefetch, so the H2D copy of batch N+1
  overlaps the TPU step of batch N);
- color jitter, ImageNet normalization, and Gaussian-target rasterization
  run on-device inside jitted code (ops/color.py, ops/heatmap.py).
"""

from __future__ import annotations

import functools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lighthand_tpu.core.mesh import batch_sharding
from lighthand_tpu.data.records import Source
from lighthand_tpu.ops.color import color_jitter, normalize_imagenet


class DevicePreprocessor:
    """Jitted uint8 -> normalized f32 (+ optional per-sample color jitter).

    Matches the reference transform stacks: ToTensor -> Resize(256) ->
    [ColorJitter(0.5,0.5,0.5,0.5) for the aug-enabled prefix] ->
    Normalize(ImageNet) (src/tools/dataset.py:134-157). Resize already
    happened host-side (sources emit canonical SxS uint8).
    """

    def __init__(self, jitter: bool = True, brightness: float = 0.5,
                 contrast: float = 0.5, saturation: float = 0.5,
                 hue: float = 0.5, out_dtype=jnp.bfloat16):
        self.jitter = jitter

        @jax.jit
        def _apply(key, images_u8, aug_enabled):
            imgs = images_u8.astype(jnp.float32) / 255.0
            if jitter:
                keys = jax.random.split(key, imgs.shape[0])
                fn = functools.partial(
                    color_jitter, brightness=brightness, contrast=contrast,
                    saturation=saturation, hue=hue,
                )
                imgs = jax.vmap(fn)(keys, imgs, enable=aug_enabled)
            # Emit the model's compute dtype: the first conv casts to bf16
            # anyway, so storing f32 activations would just double the HBM
            # traffic of the network input.
            return normalize_imagenet(imgs).astype(out_dtype)

        self._apply = _apply

    def __call__(self, key, images_u8: jnp.ndarray,
                 aug_enabled: jnp.ndarray) -> jnp.ndarray:
        return self._apply(key, images_u8, aug_enabled)


def _collate(samples, valid: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
    """Stack samples into host arrays. ``valid`` (0/1 per sample) marks
    padding rows the caller appended to keep jit shapes static — they are
    masked out downstream (train/step.py:make_eval_step)."""
    images = np.stack([s.image for s in samples])
    joints = np.stack([s.joints for s in samples]).astype(np.float32)
    aug = np.asarray([s.aug_enabled for s in samples], dtype=np.float32)
    noise = np.asarray([s.noise_enabled for s in samples], dtype=np.float32)
    hm_max = np.asarray([s.hm_max for s in samples], dtype=np.float32)
    if valid is None:
        valid = np.ones(len(samples), np.float32)
    batch = {"image_u8": images, "joints": joints, "aug_enabled": aug,
             "noise_enabled": noise, "hm_max": hm_max, "valid": valid}
    if samples[0].meta and "pose_ctgy" in samples[0].meta:
        # host-side metadata (stays off-device; used by eval/harness.py)
        batch["pose_ctgy"] = [s.meta["pose_ctgy"] for s in samples]
    return batch


class Loader:
    """Iterable over device-resident, mesh-sharded batches.

    Static shapes for jit: the ragged tail is either dropped
    (drop_last=True, training default) or padded to a full batch with a
    ``valid`` mask (drop_last=False, evaluation — the reference's
    DataLoader kept ragged tails, which XLA would re-compile on; padding
    keeps every sample AND one compiled shape).
    """

    def __init__(
        self,
        source: Source,
        batch_size: int,
        *,
        mesh=None,
        shuffle: bool = False,
        seed: int = 9001,
        num_workers: int = 8,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.source = source
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.source) // self.batch_size
        if not self.drop_last and len(self.source) % self.batch_size:
            n += 1
        return n

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.source))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        import jax

        order = self._order()
        n_full = len(order) // self.batch_size
        limit = n_full * self.batch_size if self.drop_last else len(order)
        # Multi-process runs: every process walks the SAME global order and
        # loads only the rows its addressable devices own; the device batch
        # is assembled as a global array in __iter__ (the TPU-native
        # equivalent of the reference's dormant DistributedSampler,
        # src/datasets/build.py:53-60).
        pcount = jax.process_count() if self.mesh is not None else 1
        pindex = jax.process_index() if self.mesh is not None else 0
        if pcount > 1 and self.batch_size % pcount:
            raise ValueError(
                f"batch_size {self.batch_size} must divide evenly over "
                f"{pcount} processes")
        with ThreadPoolExecutor(self.num_workers) as pool:
            # Pipeline batch fetches: up to `prefetch+1` batch futures run
            # concurrently; each decodes its items serially (a nested
            # pool.map here would starve once all workers hold batch tasks).
            def fetch(batch_idx):
                lo = batch_idx * self.batch_size
                hi = min(lo + self.batch_size, limit)
                rows = order[lo:hi]
                valid = np.ones(len(rows), np.float32)
                if len(rows) < self.batch_size:  # ragged tail, drop_last=False
                    pad = self.batch_size - len(rows)
                    rows = np.concatenate([rows, np.repeat(rows[-1:], pad)])
                    valid = np.concatenate([valid,
                                            np.zeros(pad, np.float32)])
                if pcount > 1:
                    per = self.batch_size // pcount
                    sl = slice(pindex * per, (pindex + 1) * per)
                    rows, valid = rows[sl], valid[sl]
                return _collate(self.source.getitems(rows), valid=valid)

            total = len(self)
            pending = []
            next_submit = 0
            inflight = self.prefetch + 1
            while next_submit < min(inflight, total):
                pending.append(pool.submit(fetch, next_submit))
                next_submit += 1
            done = 0
            while done < total:
                batch = pending.pop(0).result()
                if next_submit < total:
                    pending.append(pool.submit(fetch, next_submit))
                    next_submit += 1
                done += 1
                yield batch

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        """Yields device batches; transfers are issued one batch ahead."""
        multi = self.mesh is not None and jax.process_count() > 1

        def put(host_batch):
            out = {}
            for k, v in host_batch.items():
                if not isinstance(v, np.ndarray):
                    out[k] = v  # host-side metadata (e.g. pose categories)
                elif self.mesh is None:
                    out[k] = jnp.asarray(v)
                elif multi:
                    # assemble the per-process shard into one global array
                    out[k] = jax.make_array_from_process_local_data(
                        batch_sharding(self.mesh, v.ndim), v)
                else:
                    out[k] = jax.device_put(
                        v, batch_sharding(self.mesh, v.ndim))
            return out

        prev = None
        for host_batch in self._host_batches():
            cur = put(host_batch)  # async dispatch; compute overlaps
            if prev is not None:
                yield prev
            prev = cur
        if prev is not None:
            yield prev


class IterationLoader:
    """Fixed-iteration-count loader: cycles the underlying Loader,
    re-shuffling at each epoch boundary.

    First-class version of the reference's dormant
    ``IterationBasedBatchSampler``/``make_data_loader`` pair
    (src/datasets/build.py:13-106, never invoked there) — useful for
    step-based (rather than epoch-based) training schedules.
    """

    def __init__(self, loader: Loader, num_iterations: int,
                 start_iteration: int = 0):
        self.loader = loader
        self.num_iterations = num_iterations
        self.start_iteration = start_iteration

    def __len__(self) -> int:
        return self.num_iterations - self.start_iteration

    def __iter__(self):
        it = self.start_iteration
        epoch = 0
        while it < self.num_iterations:
            self.loader.set_epoch(epoch)
            for batch in self.loader:
                if it >= self.num_iterations:
                    return
                yield it, batch
                it += 1
            epoch += 1
