"""Bounded int8-conv experiment (VERDICT r4 item 3): is the precision
lever real on this chip?

BASELINE.md's round-4 roofline: the shipped HRNet-W32@256 bs128 step is
HBM-bound — conv fusions are 81.4% of the step moving 68.3 GB/microbatch
of bf16 at 86% of peak bandwidth. Halving conv bytes with s8 activations
+ s8 weights would put the theoretical step at ~1.7x (≈1800 img/s, above
the 1650 img/s 5x target) — IF XLA lowers s8xs8->s32 conv onto the MXU
at int8 rate instead of upcasting, and IF the requantize work fuses.

Measurement through the remote tunnel: ``block_until_ready`` can resolve
before the device finishes (bench.py documents the same hazard), so this
probe times HOST MATERIALIZATION of a scalar produced by a
``lax.scan``-chained stack of K identical convs, at two depths K1 << K2;
(t(K2) - t(K1)) / (K2 - K1) cancels the constant round-trip + dispatch
overhead and leaves pure per-conv device time. A chain of convs through
the same weight cannot be collapsed by XLA (each conv consumes the
previous output), and the depths are chosen so the delta is O(100 ms) of
device work — far above tunnel jitter.

Sanity anchor: the bf16 number for branch_3x3_64->64@32 should land near
its HBM-bound expectation (~34 MB in+out at ~700 GB/s ≈ 0.05 ms);
the round-4 profile puts real HRNet conv fusions at 701 GB/s.

Verdict rule: aggregate s8 speedup on the 3x3 branch/stage shapes
>= 1.5x justifies wiring a quantized forward into the model; anything
near or below 1x means the lever is dead at the XLA level and no model
integration can recover it.

Usage: python tools/int8_probe.py [--batch 128] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# (name, H=W, C) — HRNet-W32@256 bs128 traffic carriers (models/hrnet.py;
# square 3x3 stride-1 convs dominate the byte count; the stem/1x1s are
# approximated by the same-resolution square shapes).
SHAPES = [
    ("branch_3x3_32@64", 64, 32),
    ("branch_3x3_64@32", 32, 64),
    ("branch_3x3_128@16", 16, 128),
    ("branch_3x3_256@8", 8, 256),
    ("stage1_3x3_64@64", 64, 64),
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k1", type=int, default=16)
    p.add_argument("--k2", type=int, default=528)
    p.add_argument("--reps", type=int, default=3)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="int8_probe")
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    def conv(x, w, out_dtype):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_bf16(x, w, k):
        def body(x, _):
            return conv(x, w, jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, None, length=k)
        return x.astype(jnp.float32).sum()

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain_s8(x, w, k):
        def body(x, _):
            y = conv(x, w, jnp.int32)
            # realistic inter-layer requant: scale, clip, round -> s8
            return jnp.clip(
                jnp.round(y.astype(jnp.float32) * (1.0 / 256.0)),
                -127, 127).astype(jnp.int8), None
        x, _ = jax.lax.scan(body, x, None, length=k)
        return x.astype(jnp.int32).sum()

    def timed(fn, x, w, k):
        float(fn(x, w, k))  # compile + warm
        times = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            float(fn(x, w, k))  # host materialization = true completion
            times.append(time.perf_counter() - t0)
        return min(times)

    rows = []
    for name, hw, c in SHAPES:
        rng = np.random.default_rng(0)
        x = rng.standard_normal((a.batch, hw, hw, c)).astype(np.float32)
        w = (rng.standard_normal((3, 3, c, c)).astype(np.float32)
             * (0.6 / np.sqrt(9 * c)))  # spectral-ish norm: no blowup/decay

        x_bf = jnp.asarray(x, jnp.bfloat16)
        w_bf = jnp.asarray(w, jnp.bfloat16)
        t_bf = (timed(chain_bf16, x_bf, w_bf, a.k2)
                - timed(chain_bf16, x_bf, w_bf, a.k1)) / (a.k2 - a.k1)

        x_s8 = jnp.asarray(np.clip(x * 32, -127, 127).round(), jnp.int8)
        w_s8 = jnp.asarray(np.clip(w * 2048, -127, 127).round(), jnp.int8)
        try:
            t_s8 = (timed(chain_s8, x_s8, w_s8, a.k2)
                    - timed(chain_s8, x_s8, w_s8, a.k1)) / (a.k2 - a.k1)
            speed = t_bf / t_s8
        except Exception as e:  # lowering not supported -> lever dead
            t_s8, speed = float("nan"), float("nan")
            print(f"  {name}: s8 conv failed to lower: {e}", flush=True)

        gb = a.batch * hw * hw * c * 2 * 2 / 1e9  # bf16 in+out bytes
        bw = gb / t_bf if t_bf > 0 else float("nan")
        rows.append((name, t_bf * 1e3, t_s8 * 1e3, speed))
        print(f"{name}: bf16 {t_bf*1e3:.4f} ms/conv ({bw:.0f} GB/s "
              f"act-traffic), s8 {t_s8*1e3:.4f} ms/conv, "
              f"speedup {speed:.2f}x", flush=True)

    tot_bf = sum(r[1] for r in rows)
    tot_s8 = sum(r[2] for r in rows)
    print(f"\nAGGREGATE: bf16 {tot_bf:.3f} ms vs s8 {tot_s8:.3f} ms -> "
          f"{tot_bf/tot_s8:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
