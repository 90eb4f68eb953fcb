"""Pallas kernel correctness (interpret mode on the CPU test backend)."""

import numpy as np
import jax.numpy as jnp

from lighthand_tpu.ops import generate_target_batch
from lighthand_tpu.ops.pallas.heatmap import generate_target_batch_pallas


def test_pallas_heatmap_matches_jnp(rng):
    joints = rng.uniform(-40, 300, size=(4, 21, 2)).astype(np.float32)
    want = np.asarray(generate_target_batch(jnp.asarray(joints)))
    got = np.asarray(
        generate_target_batch_pallas(jnp.asarray(joints), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
