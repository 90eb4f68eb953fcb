import numpy as np
import jax.numpy as jnp

from lighthand_tpu.ops import get_max_preds, soft_argmax_preds
from tests.golden import golden_get_max_preds


def test_get_max_preds_matches_reference(rng):
    hm = rng.normal(size=(4, 21, 64, 64)).astype(np.float32)
    want_p, want_v = golden_get_max_preds(hm)
    got_p, got_v = get_max_preds(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(got_p), want_p)
    np.testing.assert_allclose(np.asarray(got_v), want_v.reshape(4, 21, 1))


def test_get_max_preds_nonpositive_masked(rng):
    hm = -np.abs(rng.normal(size=(2, 21, 64, 64))).astype(np.float32)
    preds, _ = get_max_preds(jnp.asarray(hm))
    np.testing.assert_array_equal(np.asarray(preds), 0.0)


def test_soft_argmax_close_to_hard_on_peaked_maps(rng):
    from lighthand_tpu.ops import generate_target_batch

    joints = rng.uniform(32, 224, size=(2, 21, 2)).astype(np.float32)
    hm = generate_target_batch(jnp.asarray(joints))
    hard, _ = get_max_preds(hm)
    soft, _ = soft_argmax_preds(hm, temperature=20.0)
    assert np.abs(np.asarray(soft) - np.asarray(hard)).max() < 1.0
