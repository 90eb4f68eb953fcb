import numpy as np
import jax.numpy as jnp

from lighthand_tpu.ops import (
    generate_target,
    generate_target_batch,
    generate_heatmap_max,
)
from tests.golden import golden_generate_target, golden_generate_heatmap_max


def _joint_cases(rng, n=64):
    """Joints spread across in-bounds, boundary, and out-of-bounds regimes."""
    cases = [
        rng.uniform(0, 256, size=(21, 2)),          # typical
        rng.uniform(-60, 320, size=(21, 2)),        # many partially/fully out
        rng.uniform(250, 400, size=(21, 2)),        # mostly out high
        rng.uniform(-100, 10, size=(21, 2)),        # mostly out low
        np.zeros((21, 2)),                          # all at origin
        np.full((21, 2), 255.9),                    # at far corner
    ]
    for _ in range(n):
        cases.append(rng.uniform(-80, 340, size=(21, 2)))
    return [c.astype(np.float32) for c in cases]


def test_generate_target_matches_reference(rng):
    for joints in _joint_cases(rng):
        want, want_w = golden_generate_target(joints)
        got, got_w = generate_target(jnp.asarray(joints), return_weight=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=5e-6)
        np.testing.assert_array_equal(np.asarray(got_w), want_w)


def test_generate_target_batch(rng):
    joints = rng.uniform(-40, 300, size=(8, 21, 2)).astype(np.float32)
    got = np.asarray(generate_target_batch(jnp.asarray(joints)))
    for i in range(8):
        want, _ = golden_generate_target(joints[i])
        np.testing.assert_allclose(got[i], want, rtol=0, atol=5e-6)


def test_generate_target_center_value_is_one(rng):
    joints = np.array([[128.0, 128.0]] * 21, dtype=np.float32)
    t = np.asarray(generate_target(jnp.asarray(joints)))
    # mu = int(128/4 + 0.5) = 32; unnormalized Gaussian peaks at exactly 1
    assert t[0, 32, 32] == 1.0
    assert t.max() == 1.0


def test_generate_heatmap_max_matches_reference(rng):
    for joints in _joint_cases(rng, n=32):
        # the max-combine variant is called with joint/4 (heatmap coords)
        p = joints / 4.0
        want = golden_generate_heatmap_max(p)
        got = np.asarray(generate_heatmap_max(jnp.asarray(p)))
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_encode_decode_roundtrip(rng):
    """Property from SURVEY.md section 4: argmax-decoding a generated target
    recovers the quantized joint within the 4-px stride."""
    from lighthand_tpu.ops import get_max_preds

    joints = rng.uniform(24, 232, size=(4, 21, 2)).astype(np.float32)
    hm = generate_target_batch(jnp.asarray(joints))
    preds, _ = get_max_preds(hm)
    recovered = np.asarray(preds) * 4.0
    assert np.abs(recovered - joints).max() <= 2.0 + 1e-5
