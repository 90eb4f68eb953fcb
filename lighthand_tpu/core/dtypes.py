"""Mixed-precision policy: bf16 compute on the MXU, f32 params/BN stats.

The reference trains pure f32 on cuDNN (no AMP anywhere in
/root/reference/src). On TPU the MXU natively multiplies bf16 at 2x the f32
rate, so the framework default is bf16 activations/conv compute with f32
parameters, f32 batch-norm statistics, and an f32 loss.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32  # final heatmap logits / loss
    # BatchNorm computation dtype. f32 is the safe default (stats over
    # 64x64 spatial windows); bf16 cuts normalization HBM traffic on a
    # bandwidth-bound model at some numerics risk.
    bn_dtype: jnp.dtype = jnp.float32
    # int8 forward convs (per-channel weight quant + static-clip
    # activation quant, STE backward) — the measured ~2x conv-kernel
    # speedup on v5e (BASELINE.md "The int8 lever"). Backbone ConvBN
    # only; deconv head / final 1x1 stay at compute_dtype.
    quant_fwd: bool = False
    act_clip: float = 8.0  # symmetric activation clip for quant_fwd

    @classmethod
    def full_precision(cls) -> "DTypePolicy":
        return cls(compute_dtype=jnp.float32)

    @classmethod
    def all_bf16(cls) -> "DTypePolicy":
        return cls(bn_dtype=jnp.bfloat16)

    @classmethod
    def int8_fwd(cls) -> "DTypePolicy":
        return cls(quant_fwd=True)


DEFAULT_POLICY = DTypePolicy()
