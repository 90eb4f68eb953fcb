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


def test_fused_aug_kernel_disabled_path_exact(rng):
    """aug/noise disabled -> kernel must equal plain normalize + targets."""
    import jax
    import jax.numpy as jnp

    from lighthand_tpu.ops.color import normalize_imagenet
    from lighthand_tpu.ops.heatmap import generate_target_batch
    from lighthand_tpu.ops.pallas.fused_aug import fused_aug_targets_pallas

    b, s, hm = 3, 64, 16
    images = jnp.asarray(rng.integers(0, 255, size=(b, s, s, 3),
                                      dtype=np.uint8))
    joints = jnp.asarray(rng.uniform(4, s - 4, size=(b, 21, 2))
                         .astype(np.float32))
    off = jnp.zeros((b,), jnp.float32)
    out, tgt = fused_aug_targets_pallas(jax.random.PRNGKey(0), images,
                                        joints, off, off, heatmap_size=hm,
                                        interpret=True)
    want = normalize_imagenet(images.astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want.astype(jnp.bfloat16),
                                          np.float32), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tgt),
        np.asarray(generate_target_batch(joints, hm, 4.0, 2.0)), atol=1e-5)


def test_fused_aug_kernel_noise_semantics(rng):
    """noise-only path: constant per-channel multiplicative factor."""
    import jax
    import jax.numpy as jnp

    from lighthand_tpu.ops.pallas.fused_aug import fused_aug_targets_pallas

    b, s = 2, 64
    images = jnp.asarray(rng.integers(10, 180, size=(b, s, s, 3),
                                      dtype=np.uint8))
    joints = jnp.asarray(rng.uniform(4, s - 4, size=(b, 21, 2))
                         .astype(np.float32))
    out, _ = fused_aug_targets_pallas(
        jax.random.PRNGKey(1), images, joints,
        jnp.zeros((b,), jnp.float32), jnp.ones((b,), jnp.float32),
        heatmap_size=16, interpret=True)
    from lighthand_tpu.ops.color import denormalize_imagenet

    got = np.asarray(denormalize_imagenet(out.astype(jnp.float32)))
    base = np.asarray(images, np.float32) / 255.0
    unclipped = got < 1.0 - 1e-3
    for i in range(b):
        for c in range(3):
            m = unclipped[i, ..., c] & (base[i, ..., c] > 0)
            ratio = got[i, ..., c][m] / base[i, ..., c][m]
            assert ratio.std() < 2e-2, ratio.std()  # bf16 quantization
            assert 0.55 <= ratio.mean() <= 1.45
