"""Checkpointing: Orbax-backed, best-only retention.

Mirrors the reference's single-file checkpoint semantics
(src/tools/dataset.py:340-367 ``save_checkpoint`` and src/utils/dir.py:38-47
``resume_checkpoint``): five logical fields {epoch, optimizer state,
best_loss, early-stop count, model state} written to
``{output_dir}/checkpoint-good``, host-leader gated; resume restores all
five and continues at epoch+1 (the +1 is applied here, like dir.py:41).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from lighthand_tpu.core.mesh import is_host_leader
from lighthand_tpu.train.state import TrainState

CKPT_DIR_NAME = "checkpoint-good"  # "good" = best model (train.py:99-108)


def fast_device_get(tree):
    """Fetch a pytree from device in one transfer per dtype.

    ``jax.device_get`` pulls leaves one by one; through a high-RTT remote
    device (this image tunnels to the TPU) that costs minutes for a few
    hundred parameters. Concatenating same-dtype leaves into single
    vectors makes it one round trip per dtype (typically one: f32).
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or not all(
        hasattr(x, "dtype") and hasattr(x, "shape") for x in leaves
    ):
        return jax.device_get(tree)

    groups = {}
    for i, x in enumerate(leaves):
        groups.setdefault(jnp.dtype(x.dtype), []).append(i)

    pack = jax.jit(
        lambda ls: jnp.concatenate([jnp.ravel(x) for x in ls]),
    )
    out = [None] * len(leaves)
    for dtype, idxs in groups.items():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = np.asarray(leaves[i])
            continue
        flat = np.asarray(pack([leaves[i] for i in idxs]))
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = flat[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _ckpt_path(output_dir: str, ment: str = "good") -> str:
    return os.path.abspath(os.path.join(output_dir, f"checkpoint-{ment}"))


def save_checkpoint(
    state: TrainState,
    output_dir: str,
    epoch: int,
    best_loss: float,
    count: int,
    ment: str = "good",
    model_info: Optional[dict] = None,
) -> str:
    """Host-leader-gated best-checkpoint save (src/tools/dataset.py:345).

    ``model_info`` (e.g. ``{"name": "hrnet", "precision": "bf16"}``) is
    recorded in ``last_checkpoint.json`` so eval can recover the
    architecture from the checkpoint itself instead of guessing from the
    directory name (reference analogue: the name-routed factory,
    argparser.py:103-116)."""
    path = _ckpt_path(output_dir, ment)
    if not is_host_leader():
        return path
    payload = {
        "epoch": np.asarray(epoch),
        "best_loss": np.asarray(best_loss),
        "count": np.asarray(count),
        "params": fast_device_get(state.params),
        "batch_stats": fast_device_get(state.batch_stats),
        "opt_state": fast_device_get(state.opt_state),
        "step": jax.device_get(state.step),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    # marker consumed by utils.misc.config_iteration (the reference's
    # 'last_checkpoint' file, miscellaneous.py:33-41)
    import json

    marker = {"epoch": int(epoch), "path": path}
    if model_info:
        marker["model"] = dict(model_info)
    with open(os.path.join(output_dir, "last_checkpoint.json"), "w") as f:
        json.dump(marker, f)
    return path


def read_model_info(checkpoint_dir: str) -> Optional[dict]:
    """Recover the ``model_info`` recorded at save time for a checkpoint
    directory (looks for ``last_checkpoint.json`` next to it). Returns
    None for legacy trees saved before the field existed."""
    import json

    marker = os.path.join(os.path.dirname(os.path.abspath(checkpoint_dir)),
                          "last_checkpoint.json")
    try:
        with open(marker) as f:
            info = json.load(f).get("model")
        return dict(info) if isinstance(info, dict) else None
    except (OSError, ValueError):
        return None


def checkpoint_exists(output_dir: str, ment: str = "good") -> bool:
    path = _ckpt_path(output_dir, ment)
    return os.path.isdir(path) and bool(os.listdir(path))


def resume_checkpoint(
    state: TrainState,
    output_dir: str,
    ment: str = "good",
    restore_optimizer: bool = True,
) -> Tuple[float, int, TrainState, int]:
    """Returns (best_loss, start_epoch, state, count); start_epoch is the
    stored epoch + 1 (dir.py:41). ``restore_optimizer=False`` implements the
    reference's ``--optim`` flag (train.py:50)."""
    path = _ckpt_path(output_dir, ment)
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "epoch": np.asarray(0),
        "best_loss": np.asarray(0.0),
        "count": np.asarray(0),
        "params": fast_device_get(state.params),
        "batch_stats": fast_device_get(state.batch_stats),
        "opt_state": fast_device_get(state.opt_state),
        "step": jax.device_get(state.step),
    }
    payload = ckptr.restore(path, item=template)
    new_state = state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        step=payload["step"],
    )
    if restore_optimizer:
        new_state = new_state.replace(opt_state=payload["opt_state"])
    return (
        float(payload["best_loss"]),
        int(payload["epoch"]) + 1,
        new_state,
        int(payload["count"]),
    )


def load_weights_only(state: TrainState, checkpoint_dir: str) -> TrainState:
    """Warm-start weights from another run — the ``--transfer`` path
    (argparser.py:167-187 loads output/{model}/frei/ori)."""
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "epoch": np.asarray(0),
        "best_loss": np.asarray(0.0),
        "count": np.asarray(0),
        "params": fast_device_get(state.params),
        "batch_stats": fast_device_get(state.batch_stats),
        "opt_state": fast_device_get(state.opt_state),
        "step": jax.device_get(state.step),
    }
    payload = ckptr.restore(os.path.abspath(checkpoint_dir), item=template)
    return state.replace(params=payload["params"],
                         batch_stats=payload["batch_stats"])
