import jax
import jax.numpy as jnp
import numpy as np

from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.models import get_model
from lighthand_tpu.train import create_train_state, make_train_step
from lighthand_tpu.train.checkpoint import (
    checkpoint_exists,
    load_weights_only,
    resume_checkpoint,
    save_checkpoint,
)


def _state():
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    return create_train_state(model, jax.random.PRNGKey(0),
                              input_shape=(1, 32, 32, 3), lr=1e-3)


def test_checkpoint_roundtrip(tmp_path, rng):
    state = _state()
    train_step = make_train_step(heatmap_size=8)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)),
                             dtype=jnp.float32),
        "joints": jnp.asarray(rng.uniform(4, 28, size=(2, 21, 2)),
                              dtype=jnp.float32),
    }
    state, _ = train_step(state, batch)

    out = str(tmp_path / "run")
    assert not checkpoint_exists(out)
    save_checkpoint(state, out, epoch=7, best_loss=0.123, count=3)
    assert checkpoint_exists(out)

    fresh = _state()
    best_loss, start_epoch, restored, count = resume_checkpoint(fresh, out)
    assert best_loss == 0.123
    assert start_epoch == 8  # stored epoch + 1 (dir.py:41)
    assert count == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_without_optimizer(tmp_path, rng):
    state = _state()
    out = str(tmp_path / "run")
    save_checkpoint(state, out, epoch=0, best_loss=1.0, count=0)
    fresh = _state()
    _, _, restored, _ = resume_checkpoint(fresh, out,
                                          restore_optimizer=False)
    # adam moments must be untouched (still zeros from init)
    mu = jax.tree_util.tree_leaves(restored.opt_state)
    fresh_mu = jax.tree_util.tree_leaves(fresh.opt_state)
    assert len(mu) == len(fresh_mu)


def test_transfer_weights_only(tmp_path):
    state = _state()
    out = str(tmp_path / "frei_ori")
    save_checkpoint(state, out, epoch=42, best_loss=0.5, count=9)
    fresh = _state()
    warm = load_weights_only(fresh, out + "/checkpoint-good")
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(warm.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(warm.step) == int(fresh.step)
