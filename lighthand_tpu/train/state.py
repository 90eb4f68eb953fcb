"""Train state: params + BN stats + Adam, cosine LR per epoch.

Functional replacement for the reference's mutable Runner/optimizer objects:
torch.optim.Adam(lr) + CosineAnnealingLR(T_max=epoch) stepped once per epoch
(src/tools/train.py:45-58,117).
"""

from __future__ import annotations

import contextlib
import math
from typing import Any, Callable


def _nullcontext():
    return contextlib.nullcontext()

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct


def cosine_lr(base_lr: float, epoch: int, t_max: int, eta_min: float = 0.0) -> float:
    """torch CosineAnnealingLR closed form: eta_min + (base - eta_min) *
    (1 + cos(pi * epoch / T_max)) / 2."""
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    """Adam with the torch defaults the reference uses (train.py:45-48);
    learning rate is injected so the per-epoch cosine value can be set
    without re-jitting."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def _init_variables(model: nn.Module, rng: jax.Array, init_shape,
                    cache: bool = True):
    """Initialize eagerly on CPU at <=64x64: the models are fully
    convolutional (param shapes are input-size independent — asserted by
    tests/test_train_step.py), and jit-compiling the full init graph is
    minutes of wasted XLA time on a small host / remote-compile tunnel.
    The result is disk-cached (flax msgpack) keyed by the module config +
    seed, so repeated CLI invocations skip even the eager pass."""
    import hashlib
    import os

    from flax import serialization

    # INIT_SCHEME_VERSION salts the cache: repr(model) cannot see changes
    # to initializer CODE (e.g. the torch-default init swap), so bump this
    # whenever the init distribution changes.
    INIT_SCHEME_VERSION = "torch-init-v2"
    # Pin the key-bytes read to the host: key_data on an uncommitted key
    # dispatches to the default (remote) device, and str() then does a
    # pointless tunnel round trip per CLI start (observed wedging when the
    # tunnel's RNG stream is unhealthy).
    import numpy as _np

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        key_bytes = _np.asarray(
            jax.random.key_data(jax.device_put(rng, cpu))).tobytes()
    key = hashlib.sha256(
        (repr(model) + repr(init_shape) + jax.__version__
         + INIT_SCHEME_VERSION).encode() + key_bytes
    ).hexdigest()[:24]
    cache_dir = os.path.expanduser("~/.cache/lighthand_tpu_init")
    cache_path = os.path.join(cache_dir, f"{key}.msgpack")

    def fresh():
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
        with jax.disable_jit(), ctx:
            return model.init(rng, jnp.zeros(init_shape, jnp.float32),
                              train=False)

    import logging
    import time

    log = logging.getLogger("lighthand_tpu.init")
    if not cache:
        return fresh()
    if os.path.isfile(cache_path):
        t0 = time.time()
        template = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros(init_shape, jnp.float32),
                                 train=False), rng)
        import numpy as np

        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template)
        with open(cache_path, "rb") as f:
            out = serialization.from_bytes(template, f.read())
        log.debug("init cache hit (%s): %.1fs", key, time.time() - t0)
        return out
    variables = fresh()
    os.makedirs(cache_dir, exist_ok=True)
    tmp = cache_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(variables))
    os.replace(tmp, cache_path)
    return variables


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    input_shape=(1, 256, 256, 3),
    lr: float = 1e-3,
) -> TrainState:
    import logging
    import time

    log = logging.getLogger("lighthand_tpu.init")
    init_shape = (1, min(input_shape[1], 64), min(input_shape[2], 64),
                  input_shape[3])
    t0 = time.time()
    variables = _init_variables(model, rng, init_shape)
    log.debug("model init: %.1fs", time.time() - t0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(lr)
    # Pin the optimizer init (and the step scalar) to the host CPU:
    # adam's init allocates zeros-like for EVERY param leaf, and doing
    # that eagerly on the default device is one blocking dispatch per
    # leaf — ~530 round-trips through a remote-device tunnel (measured
    # 18 min of "init params" on the synth20k run, 2026-08-19). Callers
    # that train on device already device_put the whole state once
    # (train/loop.py, bench.py); everyone else wants host arrays anyway.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    t0 = time.time()
    with ctx:
        opt_state = tx.init(params)
        step = jnp.zeros((), jnp.int32)
    log.debug("optimizer init (cpu-pinned): %.1fs", time.time() - t0)
    return TrainState(
        step=step,
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        apply_fn=model.apply,
        tx=tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected LR hyperparam (host-side, once per epoch)."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def param_count(state: TrainState) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(state.params))
