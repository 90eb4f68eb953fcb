"""Probe: do the BACKWARD convs (dgrad/wgrad) also run at int8 rate?

BASELINE.md "The int8 lever, measured" established s8 x s8 -> s32
FORWARD convs at ~2x bf16 on the HRNet traffic-carrying shapes; the
step-level projection for quantizing the backward too (conv time x0.5
-> ~1800 img/s, above the 1650 5x target) assumed dgrad and wgrad
lower equally well. That assumption is not free:

- dgrad is a normal 3x3 conv over the gradient (same shape class as the
  forward — expected to lower identically), but the per-output-channel
  weight scales sit on the CONTRACTED dim, so the factorable int8 form
  folds s_w into g first (one fusable elementwise multiply);
- wgrad is a BIG-WINDOW conv (window = the full output spatial extent,
  e.g. 64x64) contracting batch+space into a 3x3xCixCo kernel — a very
  different MXU tiling problem, and the one most likely to fall off the
  int8 fast path.

This probe times both backward forms at bf16 vs s8 on the same shape
set as tools/int8_probe.py, with the same two-depth lax.scan chaining
to cancel tunnel round-trip + dispatch overhead (block_until_ready can
resolve early through this tunnel; host materialization of a scalar is
the only trustworthy completion signal here).

Decision rule (mirrors the forward probe): aggregate s8 speedup >= 1.5x
on BOTH dgrad and wgrad justifies an int8_full training policy;
wgrad near/below 1x means backward quantization is dead at the XLA
level and the honest policy menu stays {int8_fwd, int8 inference}.

Usage: python tools/int8_bwd_probe.py [--batch 128] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# (name, H=W, C) — same carriers as tools/int8_probe.py
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
    p.add_argument("--k1", type=int, default=8)
    p.add_argument("--k2", type=int, default=264)
    p.add_argument("--reps", type=int, default=3)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="int8_bwd_probe")
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    # --- dgrad: dx = conv(g, rot180(w) with I/O swapped), stride-1 SAME.
    # g and w keep their own dtypes; out_dtype picks s32 vs bf16 path.
    def dgrad(g, w_rot, out_dtype):
        return jax.lax.conv_general_dilated(
            g, w_rot, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)

    # --- wgrad: dw = conv(x as CHWN-roles, g as IHWO-roles) — contract
    # batch+space, output spatial = 3x3. lhs spec maps x's (N,H,W,Ci)
    # axes to (C,H,W,N): batch role on Ci, contraction role on N.
    def wgrad(x, g, out_dtype):
        return jax.lax.conv_general_dilated(
            x, g, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("CHWN", "IHWO", "NHWC"),
            preferred_element_type=out_dtype)

    # chain: keep feeding the op its own (requantized) output so XLA
    # cannot collapse the scan; mirror int8_probe.py's requant cost.
    def make_chain(op, requant_to):
        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(lhs, rhs, k):
            def body(lhs, _):
                y = op(lhs, rhs, jnp.int32 if requant_to == jnp.int8
                       else jnp.bfloat16)
                if requant_to == jnp.int8:
                    y = jnp.clip(jnp.round(y.astype(jnp.float32)
                                           * (1.0 / 256.0)),
                                 -127, 127).astype(jnp.int8)
                else:
                    y = y.astype(jnp.bfloat16)
                return y, None

            lhs, _ = jax.lax.scan(body, lhs, None, length=k)
            return lhs.astype(jnp.float32).sum()
        return chain

    def timed(fn, lhs, rhs, k):
        float(fn(lhs, rhs, k))  # compile + warm
        times = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            float(fn(lhs, rhs, k))
            times.append(time.perf_counter() - t0)
        return min(times)

    def per_op(fn, lhs, rhs):
        return (timed(fn, lhs, rhs, a.k2) - timed(fn, lhs, rhs, a.k1)) \
            / (a.k2 - a.k1)

    results = {}
    for kind, op, lhs_is_g in (("dgrad", dgrad, True),
                               ("wgrad", wgrad, False)):
        print(f"\n--- {kind} ---", flush=True)
        rows = []
        for name, hw, c in SHAPES:
            rng = np.random.default_rng(0)
            g = rng.standard_normal((a.batch, hw, hw, c)).astype(np.float32)
            x = rng.standard_normal((a.batch, hw, hw, c)).astype(np.float32)
            w = (rng.standard_normal((3, 3, c, c)).astype(np.float32)
                 * (0.6 / np.sqrt(9 * c)))

            if kind == "dgrad":
                # chain feeds dx back in as the next g: same shape (C=C)
                lhs_bf = jnp.asarray(g, jnp.bfloat16)
                rhs_bf = jnp.asarray(w[::-1, ::-1].transpose(0, 1, 3, 2),
                                     jnp.bfloat16)
                lhs_s8 = jnp.asarray(np.clip(g * 32, -127, 127).round(),
                                     jnp.int8)
                rhs_s8 = jnp.asarray(
                    np.clip(w[::-1, ::-1].transpose(0, 1, 3, 2) * 2048,
                            -127, 127).round(), jnp.int8)
            else:
                # wgrad's output is 3x3xCixCo — NOT chainable through
                # itself; chain on the lhs instead by re-using dw-shaped
                # noise as a fresh rhs every step is wrong too. Instead
                # time wgrad UNCHAINED at high rep count inside one jit:
                # scan over k independent g slices from a preallocated
                # stack (consumes the iteration index, so XLA cannot
                # hoist), summing dw — the sum is the loop-carried state.
                lhs_bf = jnp.asarray(x, jnp.bfloat16)
                rhs_bf = jnp.asarray(g, jnp.bfloat16)
                lhs_s8 = jnp.asarray(np.clip(x * 32, -127, 127).round(),
                                     jnp.int8)
                rhs_s8 = jnp.asarray(np.clip(g * 32, -127, 127).round(),
                                     jnp.int8)

            if kind == "dgrad":
                chain_bf = make_chain(op, jnp.bfloat16)
                chain_s8 = make_chain(op, jnp.int8)
                t_bf = per_op(chain_bf, lhs_bf, rhs_bf)
                try:
                    t_s8 = per_op(chain_s8, lhs_s8, rhs_s8)
                except Exception as e:
                    print(f"  {name}: s8 {kind} failed to lower: {e}",
                          flush=True)
                    t_s8 = float("nan")
            else:
                @functools.partial(jax.jit, static_argnums=(2, 3))
                def wgrad_loop(xx, gg, k, s8):
                    def body(acc, i):
                        # perturb g by the loop index so the conv input
                        # differs per iteration (no hoisting)
                        gi = (gg + i.astype(gg.dtype) if not s8 else
                              (gg ^ i.astype(jnp.int8)))
                        dw = wgrad(xx, gi,
                                   jnp.int32 if s8 else jnp.bfloat16)
                        return acc + dw.astype(jnp.float32).sum(), None
                    acc, _ = jax.lax.scan(
                        body, jnp.float32(0.0),
                        jnp.arange(k, dtype=jnp.int32 if s8
                                   else jnp.float32))
                    return acc

                def timed_w(xx, gg, k, s8):
                    float(wgrad_loop(xx, gg, k, s8))
                    ts = []
                    for _ in range(a.reps):
                        t0 = time.perf_counter()
                        float(wgrad_loop(xx, gg, k, s8))
                        ts.append(time.perf_counter() - t0)
                    return min(ts)

                t_bf = (timed_w(lhs_bf, rhs_bf, a.k2, False)
                        - timed_w(lhs_bf, rhs_bf, a.k1, False)) \
                    / (a.k2 - a.k1)
                try:
                    t_s8 = (timed_w(lhs_s8, rhs_s8, a.k2, True)
                            - timed_w(lhs_s8, rhs_s8, a.k1, True)) \
                        / (a.k2 - a.k1)
                except Exception as e:
                    print(f"  {name}: s8 {kind} failed to lower: {e}",
                          flush=True)
                    t_s8 = float("nan")

            speed = t_bf / t_s8 if t_s8 == t_s8 else float("nan")
            rows.append((name, t_bf * 1e3, t_s8 * 1e3, speed))
            print(f"{name}: bf16 {t_bf*1e3:.4f} ms/op, s8 "
                  f"{t_s8*1e3:.4f} ms/op, speedup {speed:.2f}x",
                  flush=True)

        tot_bf = sum(r[1] for r in rows)
        tot_s8 = sum(r[2] for r in rows)
        print(f"{kind} AGGREGATE: bf16 {tot_bf:.3f} ms vs s8 "
              f"{tot_s8:.3f} ms -> {tot_bf/tot_s8:.2f}x", flush=True)
        results[kind] = tot_bf / tot_s8

    print(f"\nVERDICT: dgrad {results.get('dgrad', float('nan')):.2f}x, "
          f"wgrad {results.get('wgrad', float('nan')):.2f}x "
          f"(>=1.5x both -> int8_full policy is justified)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
