"""Benchmark: training images/sec/chip for HRNet-W32 @ 256x256 heatmap
regression (the BASELINE.json headline metric), measured end-to-end on the
attached TPU chip with the framework's shipped fused train step:
uint8 batch in -> on-device color jitter + ImageNet normalize (bf16) +
Gaussian-target rasterization + forward/backward + Adam, lax.scan over 4
pre-staged microbatches per dispatch (exactly what
`cli.train --steps-per-dispatch 4` runs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
BASELINE.json's target is ">=5x images/sec/chip vs the PyTorch reference on
1 GPU-equivalent". We use 330 img/s as the reference figure — a
representative throughput for the reference's exact torch workload
(HRNet-W32@256, bs32, fp32 + cudnn.benchmark, including its per-step host
sync, method.py:172-178) on an A100-class GPU — because no GPU exists in
this image to measure directly. vs_baseline = value / 330.0.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 330.0  # torch HRNet-W32@256 bs32 on A100 (see above)

BATCH = 128        # sweep: bs64 646 / bs128 1011 / bs192 735 / bs256 888
SCAN_STEPS = 4     # optimizer steps per dispatch (+5% over per-step)
SIZE = 256
WARMUP = 2
MEASURE = 8        # dispatches; = MEASURE * SCAN_STEPS optimizer steps


def main() -> None:
    from lighthand_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from lighthand_tpu.core.mesh import (
        MeshSpec,
        create_mesh,
        replicated_sharding,
    )
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state
    from lighthand_tpu.train.step import make_fused_train_step

    mesh = create_mesh(MeshSpec())
    n_chips = len(jax.devices())

    model = get_model("hrnet_w32")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, SIZE, SIZE, 3), lr=1e-3)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_fused_train_step(heatmap_size=SIZE // 4, stride=4.0,
                                 jitter=True, scan_steps=SCAN_STEPS)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)

    def shard(x):
        # microbatch dim unsharded, batch dim over the mesh 'data' axis
        spec = P(None, "data", *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    images_u8 = shard(rng.integers(
        0, 255, size=(SCAN_STEPS, BATCH, SIZE, SIZE, 3), dtype=np.uint8))
    joints = shard(rng.uniform(
        16, SIZE - 16, size=(SCAN_STEPS, BATCH, 21, 2)).astype(np.float32))
    aug = shard(np.ones((SCAN_STEPS, BATCH), np.float32))
    batch = {"image_u8": images_u8, "joints": joints, "aug_enabled": aug}
    key = jax.random.PRNGKey(1)

    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    total_images = MEASURE * SCAN_STEPS * BATCH
    ips_per_chip = total_images / elapsed / n_chips

    print(json.dumps({
        "metric": f"train images/sec/chip (HRNet-W32@256^2, bs{BATCH}, "
                  f"bf16, scan{SCAN_STEPS}, incl. on-device "
                  "aug+heatmap-target)",
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
