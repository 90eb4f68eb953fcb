import jax
import jax.numpy as jnp
import numpy as np

from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.models import get_model
from lighthand_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
    cosine_lr,
)
from lighthand_tpu.train.state import set_learning_rate


def _tiny_batch(rng, b=4, size=64, hm=16):
    imgs = rng.normal(size=(b, size, size, 3)).astype(np.float32)
    joints = rng.uniform(8, size - 8, size=(b, 21, 2)).astype(np.float32)
    return {"image": jnp.asarray(imgs), "joints": jnp.asarray(joints)}


def test_overfit_single_batch(rng):
    """One-batch overfit smoke test (SURVEY.md section 4): loss must drop
    substantially within a few dozen steps."""
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3), lr=1e-3)
    # heatmap at stride 4 of a 64px image -> 16x16
    train_step = make_train_step(heatmap_size=16, stride=4.0)
    batch = _tiny_batch(rng)

    state, m0 = train_step(state, batch)
    first = float(m0["loss"])
    for _ in range(40):
        state, m = train_step(state, batch)
    last = float(m["loss"])
    assert last < first * 0.5, (first, last)


def test_eval_step_metrics(rng):
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3))
    eval_step = make_eval_step(heatmap_size=16, stride=4.0)
    batch = _tiny_batch(rng)
    m = eval_step(state, batch)
    assert 0.0 <= float(m["pck"]) <= 1.0
    assert float(m["epe_count"]) == 4 * 19
    assert m["pred_joints"].shape == (4, 21, 2)
    assert np.isfinite(float(m["loss"]))


def test_cosine_lr_matches_torch_formula():
    # epoch 0 -> base lr; epoch T_max -> 0
    assert cosine_lr(1e-3, 0, 100) == 1e-3
    assert abs(cosine_lr(1e-3, 100, 100)) < 1e-12
    assert abs(cosine_lr(1e-3, 50, 100) - 5e-4) < 1e-12


def test_set_learning_rate_applies(rng):
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3), lr=1e-3)
    state = set_learning_rate(state, 1e-5)
    got = float(state.opt_state.hyperparams["learning_rate"])
    assert abs(got - 1e-5) < 1e-9  # stored as f32
