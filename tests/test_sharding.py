"""Multi-device (8 virtual CPU devices, see conftest) sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lighthand_tpu.core import (
    MeshSpec,
    batch_sharding,
    create_mesh,
    param_sharding,
    replicated_sharding,
)
from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.models import get_model
from lighthand_tpu.train import create_train_state, make_train_step


def test_mesh_shapes():
    mesh = create_mesh(MeshSpec(data=-1, model=1))
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = create_mesh(MeshSpec(data=4, model=2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_data_parallel_train_step(rng):
    """Full train step under an 8-way data mesh: batch sharded, params
    replicated, gradients all-reduced by XLA."""
    mesh = create_mesh(MeshSpec(data=-1, model=1))
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 32, 32, 3), lr=1e-3)
    state = jax.device_put(state, replicated_sharding(mesh))

    train_step = make_train_step(heatmap_size=8, stride=4.0)

    imgs = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
    joints = rng.uniform(4, 28, size=(16, 21, 2)).astype(np.float32)
    batch = {
        "image": jax.device_put(jnp.asarray(imgs), batch_sharding(mesh, 4)),
        "joints": jax.device_put(jnp.asarray(joints), batch_sharding(mesh, 3)),
    }
    state2, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params must remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_equals_single_device(rng):
    """The sharded step must produce the same loss as an unsharded one."""
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 32, 32, 3), lr=1e-3)
    train_step = make_train_step(heatmap_size=8, stride=4.0)

    imgs = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    joints = rng.uniform(4, 28, size=(8, 21, 2)).astype(np.float32)
    batch_plain = {"image": jnp.asarray(imgs), "joints": jnp.asarray(joints)}
    _, m_plain = train_step(state, batch_plain)

    mesh = create_mesh(MeshSpec(data=-1, model=1))
    state_r = create_train_state(model, jax.random.PRNGKey(0),
                                 input_shape=(1, 32, 32, 3), lr=1e-3)
    state_r = jax.device_put(state_r, replicated_sharding(mesh))
    batch_sharded = {
        "image": jax.device_put(jnp.asarray(imgs), batch_sharding(mesh, 4)),
        "joints": jax.device_put(jnp.asarray(joints), batch_sharding(mesh, 3)),
    }
    _, m_shard = train_step(state_r, batch_sharded)
    assert abs(float(m_plain["loss"]) - float(m_shard["loss"])) < 1e-5


def test_param_sharding_fsdp():
    mesh = create_mesh(MeshSpec(data=4, model=2))
    w = jnp.zeros((8, 128))
    s = param_sharding(mesh, w)
    placed = jax.device_put(w, s)
    assert not placed.sharding.is_fully_replicated
    # a scalar stays replicated
    s0 = param_sharding(mesh, jnp.zeros(()))
    assert jax.device_put(jnp.zeros(()), s0).sharding.is_fully_replicated
