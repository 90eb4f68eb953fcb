"""int8 quantized convolution (forward) with straight-through backward.

The round-5 microbenchmark (tools/int8_probe.py, BASELINE.md "The int8
lever, measured") shows v5e lowers s8 x s8 -> s32 conv onto the MXU at
~2x the bf16 rate on the HRNet traffic-carrying shapes, requantize
included. This module turns that into a model-level forward path:

- weights: per-output-channel symmetric quantization, scales derived
  from the f32 master weights every step (the reduction is over the
  kernel tensor — negligible traffic);
- activations: per-tensor symmetric quantization with a STATIC clip
  (default 8.0 — covers post-BN/ReLU feature ranges; the stem input is
  ImageNet-normalized to ~[-2.7, 2.7]). A static scale is what lets XLA
  fuse the quantize into the producing op's epilogue so the int8 tensor
  is what lands in HBM — a dynamic max|x| scale would force a second
  full pass over x and give back most of the bandwidth win;
- backward: straight-through estimator — gradients are exactly the bf16
  dgrad/wgrad of the unquantized conv at (x, w), so the optimizer/HBM
  behavior of the backward pass is unchanged from the bf16 policy.

This is the standard quantization-aware-training forward (Jacob et al.,
CVPR 2018) specialized to TPU fusion rules. The reference trains pure
f32 (no AMP anywhere in /root/reference/src); this path is a TPU
extension gated behind DTypePolicy.quant_fwd / --precision int8_fwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _plain_conv(x, w, strides, padding, compute_dtype):
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype)


def _quant_forward(x, w, strides, padding, act_clip, out_dtype):
    # per-output-channel weight scales from the f32 master weights
    s_w = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    s_w = jnp.maximum(s_w, 1e-8) / 127.0                       # [Cout]
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w), -127, 127
                   ).astype(jnp.int8)

    s_x = act_clip / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_x)),
                   -127, 127).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    scale = (s_x * s_w).astype(jnp.float32)                    # [Cout]
    return (y.astype(jnp.float32) * scale).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def int8_conv(x, w, strides, padding, act_clip, compute_dtype):
    """Quantized-forward conv, STE backward.

    x: NHWC activations (any float dtype); w: HWIO f32 master weights.
    strides/padding: as lax.conv_general_dilated. act_clip: static
    symmetric activation clip. compute_dtype: dtype of the output and of
    the STE backward convs (the policy's compute_dtype).
    """
    return _quant_forward(x, w, strides, padding, act_clip, compute_dtype)


def _int8_conv_fwd(x, w, strides, padding, act_clip, compute_dtype):
    y = _quant_forward(x, w, strides, padding, act_clip, compute_dtype)
    return y, (x, w)


def _int8_conv_bwd(strides, padding, act_clip, compute_dtype, res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: _plain_conv(x_, w_, strides, padding, compute_dtype),
        x, w)
    dx, dw = vjp(g.astype(compute_dtype))
    return dx.astype(x.dtype), dw.astype(w.dtype)


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)
