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
import sys
import time

import jax
import numpy as np

REFERENCE_IMG_PER_SEC = 330.0  # torch HRNet-W32@256 bs32 on A100 (see above)

BATCH = 128        # sweep: bs64 646 / bs128 1011 / bs192 735 / bs256 888
SCAN_STEPS = 4     # optimizer steps per dispatch (+5% over per-step)
SIZE = 256
WARMUP = 2
MEASURE = 8        # dispatches; = MEASURE * SCAN_STEPS optimizer steps

# BASELINE.md configs beyond the headline (run with --all). Covers all 5
# BASELINE.json "configs" rows: (1) SimpleBaseline@224 at the reference
# bs32 and at the TPU-optimal batch, (2) the headline (main run below),
# (3) SimpleBaseline@256, (4) HRNet-W48@256, (5) the multi-dataset mix
# route = per-sample hm_max target dispatch (registry.py mix), which
# falls back to the jnp preprocess chain by design. Values land in
# BENCH_TABLE.json; the headline line stays the driver contract.
EXTRA_CONFIGS = [
    ("simplebaseline", 256, 256, "bf16", "msra"),
    ("simplebaseline", 32, 224, "bf16", "msra"),
    ("simplebaseline", 256, 224, "bf16", "msra"),
    ("hrnet_w48", 64, 256, "bf16", "msra"),
    ("hrnet_w32", 128, 256, "all_bf16", "msra"),
    ("hrnet_w32", 128, 256, "int8_fwd", "msra"),
    ("simplebaseline", 256, 256, "bf16", "per_sample"),
]

# Per-config reference estimates (img/s), derived by the same byte-
# accounting that grounds the headline 330: conv fwd+bwd traffic per
# image (tools/conv_bytes.py, fp32) -> A100-bandwidth ceiling -> times
# the realized fraction the 330 pick implies for HRNet-W32@256
# (330/1910 = 0.173). Equivalently: 330 x (W32 bytes / config bytes).
# See BASELINE.md "Per-config reference estimates (round 5)".
REF_ESTIMATES = {
    ("hrnet_w32", 256): 330.0,
    ("simplebaseline", 224): 669.0,
    ("simplebaseline", 256): 531.0,
    ("hrnet_w48", 256): 237.0,
}


def measure(model_name: str, batch: int, size: int,
            precision: str = "bf16", scan_steps: int = SCAN_STEPS,
            measure: int = MEASURE, target_style: str = "msra") -> float:
    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.core.prng import cpu_prng_key, host_split
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

    policy = (DTypePolicy.all_bf16() if precision == "all_bf16"
              else DTypePolicy.int8_fwd() if precision == "int8_fwd"
              else DTypePolicy())
    model = get_model(model_name, policy=policy)
    state = create_train_state(model, cpu_prng_key(0),
                               input_shape=(1, size, size, 3), lr=1e-3)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_fused_train_step(heatmap_size=size // 4, stride=4.0,
                                 jitter=True, scan_steps=scan_steps,
                                 target_style=target_style)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)

    def shard(x):
        # microbatch dim unsharded, batch dim over the mesh 'data' axis
        spec = P(None, "data", *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    batch_d = {
        "image_u8": shard(rng.integers(
            0, 255, size=(scan_steps, batch, size, size, 3),
            dtype=np.uint8)),
        "joints": shard(rng.uniform(
            16, size - 16,
            size=(scan_steps, batch, 21, 2)).astype(np.float32)),
        "aug_enabled": shard(np.ones((scan_steps, batch), np.float32)),
        "noise_enabled": shard(np.zeros((scan_steps, batch), np.float32)),
    }
    if target_style == "per_sample":
        # mix route: half the batch uses max-combine targets (hm_max=1)
        batch_d["hm_max"] = shard(
            (rng.uniform(size=(scan_steps, batch)) < 0.5)
            .astype(np.float32))
    key = cpu_prng_key(1)

    for _ in range(WARMUP):
        key, sub = host_split(key)
        state, metrics = step(state, sub, batch_d)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(measure):
        key, sub = host_split(key)
        state, metrics = step(state, sub, batch_d)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0
    ips = measure * scan_steps * batch / elapsed / n_chips

    # Cross-check with per-dispatch blocking: through the remote tunnel the
    # pipelined timing has (rarely) produced impossible numbers when the
    # final block resolved early; the blocked measurement is a hard floor.
    t0 = time.perf_counter()
    for _ in range(3):
        key, sub = host_split(key)
        state, metrics = step(state, sub, batch_d)
        jax.block_until_ready(metrics["loss"])
    blocked_ips = 3 * scan_steps * batch / (time.perf_counter() - t0) / n_chips
    if ips > 1.3 * blocked_ips:
        print(f"# WARNING: pipelined timing implausible "
              f"({ips:.0f} vs blocked {blocked_ips:.0f} img/s); "
              f"reporting the blocked measurement", flush=True)
        return blocked_ips
    return ips


def main() -> None:
    from lighthand_tpu.core.cache import enable_compilation_cache
    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="bench")
    enable_compilation_cache()

    ips_per_chip = measure("hrnet_w32", BATCH, SIZE, "bf16")

    if "--all" in sys.argv:
        def row(model_name, size, ips):
            ref = REF_ESTIMATES[(model_name, size)]
            return {"img_per_sec": round(ips, 2), "ref_estimate": ref,
                    "vs_ref": round(ips / ref, 2)}

        table = {f"hrnet_w32@{SIZE} bs{BATCH} bf16":
                 row("hrnet_w32", SIZE, ips_per_chip)}
        print(f"# hrnet_w32@{SIZE} bs{BATCH} bf16 (headline): "
              f"{ips_per_chip:.2f} img/s/chip", flush=True)
        for model_name, batch, size, precision, style in EXTRA_CONFIGS:
            ips = measure(model_name, batch, size, precision,
                          target_style=style)
            key = f"{model_name}@{size} bs{batch} {precision}"
            if style != "msra":
                key += f" {style}(mix)"
            table[key] = row(model_name, size, ips)
            print(f"# {key}: {ips:.2f} img/s/chip "
                  f"({table[key]['vs_ref']}x ref)", flush=True)
        table["_ref_method"] = (
            "ref_estimate = 330 x (hrnet_w32 conv bytes / config conv "
            "bytes), tools/conv_bytes.py; BASELINE.md 'Per-config "
            "reference estimates (round 5)'")
        with open("BENCH_TABLE.json", "w") as f:
            json.dump(table, f, indent=1)
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
