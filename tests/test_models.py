import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.models import get_model


def _init_and_apply(model, batch=2, size=64, train=False):
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    if train:
        out, new_vars = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        return out, variables, new_vars
    return model.apply(variables, x, train=False), variables, None


@pytest.mark.parametrize("name", ["resnet18", "simplebaseline"])
def test_resnet_output_shape(name):
    # 64x64 input -> heatmaps at stride 4 -> 16x16 (full-res test is slow on CPU)
    model = get_model(name, policy=DTypePolicy.full_precision())
    out, _, _ = _init_and_apply(model, batch=2, size=64)
    assert out.shape == (2, 16, 16, 21)
    assert out.dtype == jnp.float32


def test_hrnet_output_shape():
    model = get_model("hrnet_w32", policy=DTypePolicy.full_precision())
    out, _, _ = _init_and_apply(model, batch=1, size=64)
    assert out.shape == (1, 16, 16, 21)
    assert out.dtype == jnp.float32


def test_batch_stats_update_in_train_mode():
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, new_vars = model.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(new_vars["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    assert changed


def test_hrnet_param_count_w48_vs_w32():
    w32 = get_model("hrnet_w32")
    w48 = get_model("hrnet_w48")
    x = jnp.zeros((1, 64, 64, 3))
    n32 = sum(p.size for p in jax.tree_util.tree_leaves(
        w32.init(jax.random.PRNGKey(0), x, train=False)["params"]))
    n48 = sum(p.size for p in jax.tree_util.tree_leaves(
        w48.init(jax.random.PRNGKey(0), x, train=False)["params"]))
    # HRNet-W32 ~28.5M, HRNet-W48 ~63.6M (published pose-HRNet sizes)
    assert 25e6 < n32 < 33e6, n32
    assert 58e6 < n48 < 70e6, n48
