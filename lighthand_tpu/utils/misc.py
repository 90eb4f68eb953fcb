"""Misc utilities.

Reference: src/utils/miscellaneous.py:15-169 (mkdir, save_config/yaml io,
freeze/unfreeze_weights via regex param matching, set_seed, try_once) —
re-expressed for a functional JAX stack: freezing is an optax mask (no
mutable requires_grad), seeding returns a PRNG key.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import re
from typing import Any, Callable

import jax
import numpy as np
import optax
import yaml


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root device PRNG key
    (reference seeds torch/cuda/np/random with 9001, train.py:15-22)."""
    np.random.seed(seed)
    import random

    random.seed(seed)
    from lighthand_tpu.core.prng import cpu_prng_key

    return cpu_prng_key(seed)


def save_config(cfg: Any, output_dir: str, name: str = "config.yaml") -> str:
    mkdir(output_dir)
    path = os.path.join(output_dir, name)
    payload = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) \
        else dict(cfg)
    with open(path, "w") as f:
        yaml.safe_dump(payload, f)
    return path


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def freeze_mask(params, patterns: list[str]) -> Any:
    """Boolean pytree: False where the flattened param path matches any
    regex — the functional analogue of freeze_weights' requires_grad=False
    (miscellaneous.py regex matching). Use with ``masked_optimizer``."""
    regexes = [re.compile(p) for p in patterns]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path) -> str:
        return "/".join(str(getattr(k, "key", k)) for k in path)

    frozen_paths = {
        path_str(path) for path, _ in flat
        if any(r.search(path_str(path)) for r in regexes)
    }

    def mask_leaf(path, _):
        return path_str(path) not in frozen_paths

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def masked_optimizer(tx: optax.GradientTransformation,
                     trainable_mask) -> optax.GradientTransformation:
    """Zero updates for frozen leaves (mask False)."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask),
    )


def try_once(fn: Callable) -> Callable:
    """Swallow-and-log error decorator (miscellaneous.py:135-146)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — by design
            print(f"[try_once] {fn.__name__} failed: {e}")
            return None

    return wrapper


def config_iteration(output_dir: str) -> int:
    """Parse the last checkpointed epoch from the run dir (reference parsed
    a 'last_checkpoint' file, miscellaneous.py)."""
    marker = os.path.join(output_dir, "last_checkpoint.json")
    if not os.path.isfile(marker):
        return 0
    with open(marker) as f:
        return int(json.load(f).get("epoch", 0))
