"""Serving-path throughput: predict step bf16 vs int8_fwd, same method as
bench.measure (pipelined timing + blocked-floor cross-check; the tunnel's
block_until_ready can resolve early — bench.py documents the hazard).

Completes the int8 story (BASELINE.md "The int8 lever, measured"): the
TRAINING step measured 0.97x (STE backward keeps bf16 activation traffic),
so inference — no backward — is where the kernel-level 2x must show up if
anywhere. Reference serves f32 torch (src/tools/wearable_eval_2d.py); this
is a TPU extension measurement.
"""
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP, MEASURE, BLOCKED = 5, 30, 5


def measure_predict(precision: str, batch=128, size=256) -> float:
    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.core.mesh import (MeshSpec, create_mesh,
                                         replicated_sharding)
    from lighthand_tpu.core.prng import cpu_prng_key
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state
    from lighthand_tpu.train.step import make_predict_step

    mesh = create_mesh(MeshSpec())
    policy = (DTypePolicy.int8_fwd() if precision == "int8_fwd"
              else DTypePolicy())
    model = get_model("hrnet_w32", policy=policy)
    state = create_train_state(model, cpu_prng_key(0),
                               input_shape=(1, size, size, 3))
    state = jax.device_put(state, replicated_sharding(mesh))
    predict = make_predict_step(stride=4.0)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(batch, size, size, 3)).astype(np.float32),
        replicated_sharding(mesh))

    for _ in range(WARMUP):
        joints, maxvals = predict(state, images)
    jax.block_until_ready(maxvals)

    t0 = time.perf_counter()
    for _ in range(MEASURE):
        joints, maxvals = predict(state, images)
    jax.block_until_ready(maxvals)
    ips = MEASURE * batch / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    for _ in range(BLOCKED):
        joints, maxvals = predict(state, images)
        jax.block_until_ready(maxvals)
    blocked_ips = BLOCKED * batch / (time.perf_counter() - t0)
    if ips > 1.3 * blocked_ips:
        print(f"# WARNING: pipelined implausible ({ips:.0f} vs blocked "
              f"{blocked_ips:.0f}); reporting blocked", flush=True)
        return blocked_ips
    return ips


def main():
    from lighthand_tpu.core.cache import enable_compilation_cache
    from lighthand_tpu.train.watchdog import device_reachability_gate
    device_reachability_gate(who="int8-serving-bench")
    enable_compilation_cache()
    out = {}
    for precision in ("bf16", "int8_fwd"):
        out[precision] = round(measure_predict(precision), 2)
        print(f"# predict hrnet_w32@256 bs128 {precision}: "
              f"{out[precision]} img/s", flush=True)
    out["speedup"] = round(out["int8_fwd"] / out["bf16"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
