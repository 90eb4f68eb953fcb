"""Pallas TPU kernel: fused Gaussian heatmap target generation.

The BASELINE.json north star asks for the data-side hot loop — the per-
sample 21-joint Gaussian rasterization the reference ran as a Python paste
loop in DataLoader workers (src/tools/dataset.py:165-212) — as an on-chip
kernel. The jnp formulation (ops/heatmap.py) already runs on-device; this
kernel goes one step further and keeps the whole [J, 64, 64] tile in VMEM,
computing the distance field with broadcasted iotas on the VPU:

  grid: one program per batch element
  scalar input: quantized centers + validity (prefetched to SMEM)
  output block: [J, H, H] written once, no HBM round-trips

Semantics identical to ops.heatmap.generate_target (verified bit-exact on
real TPU v5e: max |diff| = 0.0; also in interpret mode on CPU,
tests/test_pallas.py).

Measured standalone on v5e (bs128): jnp 252 us vs pallas 275 us — XLA
already emits an optimal fused VPU loop for the distance-field
formulation, and a standalone pallas_call adds launch overhead. The
production train step therefore uses the jnp version (which additionally
fuses INTO the surrounding step); this kernel is kept as the validated
Pallas reference implementation for the op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEATMAP = 64
TMP = 6  # 3 * sigma


def _heatmap_kernel(mu_ref, out_ref, *, num_joints: int, heatmap_size: int,
                    sigma: float):
    """mu_ref: SMEM [1, J, 3] int32 (mu_x, mu_y, valid);
    out_ref: VMEM [1, J, H, H]."""
    tmp = int(3 * sigma)
    ys = jax.lax.broadcasted_iota(jnp.int32, (heatmap_size, heatmap_size), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (heatmap_size, heatmap_size), 1)

    # SMEM scalars -> per-joint broadcast; J=21 is static so the loop
    # unrolls into 21 independent VPU tiles.
    inv = 1.0 / (2.0 * sigma * sigma)
    for j in range(num_joints):
        mu_x = mu_ref[0, j, 0]
        mu_y = mu_ref[0, j, 1]
        valid = mu_ref[0, j, 2]
        dx = xs - mu_x
        dy = ys - mu_y
        g = jnp.exp(-(dx.astype(jnp.float32) ** 2
                      + dy.astype(jnp.float32) ** 2) * inv)
        support = (jnp.abs(dx) <= tmp) & (jnp.abs(dy) <= tmp)
        out_ref[0, j] = (g * support.astype(jnp.float32)
                         * valid.astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("heatmap_size", "stride", "sigma",
                                    "interpret"))
def generate_target_batch_pallas(
    joints: jnp.ndarray,
    heatmap_size: int = HEATMAP,
    stride: float = 4.0,
    sigma: float = 2.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, J, 2] -> [B, J, H, H] via the Pallas kernel."""
    b, j = joints.shape[0], joints.shape[1]
    tmp = int(3 * sigma)

    mu = (joints[..., :2].astype(jnp.float32) / stride + 0.5).astype(jnp.int32)
    ul = mu - tmp
    br = mu + tmp + 1
    valid = ~(
        (ul[..., 0] >= heatmap_size) | (ul[..., 1] >= heatmap_size)
        | (br[..., 0] < 0) | (br[..., 1] < 0)
    )
    packed = jnp.concatenate(
        [mu, valid.astype(jnp.int32)[..., None]], axis=-1
    )  # [B, J, 3]

    kernel = functools.partial(_heatmap_kernel, num_joints=j,
                               heatmap_size=heatmap_size, sigma=sigma)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, j, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, j, heatmap_size, heatmap_size),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, j, heatmap_size, heatmap_size),
                                       jnp.float32),
        interpret=interpret,
    )(packed)
