"""Jitted train / eval steps.

The whole per-step pipeline stays on-device: Gaussian target rasterization
(ops.heatmap), forward, loss, backward, Adam update, and — in eval — argmax
decoding and PCK/EPE. The reference instead synced predictions to the host
every training step for numpy decoding (method.py:172-178) and rasterized
targets in Python DataLoader workers.

Sharding: batches arrive sharded over the mesh 'data' axis; parameters are
replicated (or FSDP-sharded over 'model'); XLA inserts the gradient
all-reduce when it partitions the jitted computation — the TPU-native
equivalent of DDP (SURVEY.md section 2.2).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from lighthand_tpu.ops.decode import get_max_preds
from lighthand_tpu.ops.heatmap import generate_target_batch
from lighthand_tpu.ops.metrics import (
    epe_train,
    epe_visible,
    joints_mse_loss,
    pck_2d,
)

Batch = Dict[str, jnp.ndarray]  # image [B,H,W,3] f32, joints [B,21,2(+1)]


def _forward_loss(params, batch_stats, apply_fn, images, targets, train: bool):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        pred, mutated = apply_fn(variables, images, train=True,
                                 mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        pred = apply_fn(variables, images, train=False)
        new_stats = batch_stats
    # pred is NHWC [B,64,64,21]; targets [B,21,64,64] -> align to NHWC
    loss = joints_mse_loss(pred, jnp.transpose(targets, (0, 2, 3, 1)))
    return loss, (pred, new_stats)


def make_train_step(heatmap_size: int = 64, stride: float = 4.0,
                    sigma: float = 2.0):
    """Returns train_step(state, batch) -> (state, metrics). Donates state."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch: Batch):
        targets = generate_target_batch(
            batch["joints"][..., :2], heatmap_size, stride, sigma
        )

        def loss_fn(params):
            return _forward_loss(params, state.batch_stats, state.apply_fn,
                                 batch["image"], targets, train=True)

        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, {"loss": loss}

    return train_step


def make_fused_train_step(heatmap_size: int = 64, stride: float = 4.0,
                          sigma: float = 2.0, jitter: bool = True,
                          scan_steps: int = 1):
    """Fully-fused train step: uint8 batch in, preprocess (jitter +
    normalize, ops/color.py) inside the jit, optional ``lax.scan`` over
    ``scan_steps`` pre-staged microbatches.

    vs the plain ``make_train_step``:
    - H2D traffic drops 4x (uint8 crosses the wire, f32 never exists in
      HBM — the normalize emits bf16 straight into the first conv);
    - with scan_steps>1, one Python dispatch drives K optimizer steps
      (on v5e: bs128 K=4 -> +5% over per-step dispatch).

    Returns step(state, key, batch) -> (state, metrics) where batch has
    image_u8 [K?, B, H, W, 3] u8, joints [K?, B, 21, 2], aug_enabled
    [K?, B] (leading K only when scan_steps > 1). Donates state.
    """
    import functools as _functools

    from lighthand_tpu.ops.color import color_jitter, normalize_imagenet

    def _preprocess(key, images_u8, aug_enabled):
        imgs = images_u8.astype(jnp.float32) / 255.0
        if jitter:
            keys = jax.random.split(key, imgs.shape[0])
            imgs = jax.vmap(color_jitter)(keys, imgs, enable=aug_enabled)
        return normalize_imagenet(imgs).astype(jnp.bfloat16)

    def _one(state, key, images_u8, joints, aug_enabled):
        images = _preprocess(key, images_u8, aug_enabled)
        targets = generate_target_batch(joints[..., :2], heatmap_size,
                                        stride, sigma)

        def loss_fn(params):
            return _forward_loss(params, state.batch_stats, state.apply_fn,
                                 images, targets, train=True)

        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return state.apply_gradients(grads, new_stats), loss

    if scan_steps == 1:
        @_functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, key, batch):
            state, loss = _one(state, key, batch["image_u8"],
                               batch["joints"], batch["aug_enabled"])
            return state, {"loss": loss}

        return step

    @_functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, key, batch):
        keys = jax.random.split(key, scan_steps)

        def body(s, xs):
            k, imgs, joints, aug = xs
            s, loss = _one(s, k, imgs, joints, aug)
            return s, loss

        state, losses = jax.lax.scan(
            body, state,
            (keys, batch["image_u8"], batch["joints"],
             batch["aug_enabled"]),
        )
        return state, {"loss": jnp.mean(losses)}

    return step


def make_eval_step(heatmap_size: int = 64, stride: float = 4.0,
                   sigma: float = 2.0, pck_t: float = 0.2):
    """Returns eval_step(state, batch) -> metrics dict, all on-device.

    Mirrors the reference validation branch (method.py:218-287): loss,
    argmax decode x4, PCK(T=0.2, proportion), EPE (sum, count) for
    weighted averaging.
    """

    @jax.jit
    def eval_step(state, batch: Batch):
        joints = batch["joints"]
        targets = generate_target_batch(joints[..., :2], heatmap_size,
                                        stride, sigma)
        loss, (pred, _) = _forward_loss(
            state.params, state.batch_stats, state.apply_fn,
            batch["image"], targets, train=False,
        )
        # NHWC -> NCHW for decoding
        pred_nchw = jnp.transpose(pred, (0, 3, 1, 2))
        pred_joints, _ = get_max_preds(pred_nchw)
        pred_joints = pred_joints * stride  # 64 -> 256 space (method.py:157)

        pck = pck_2d(pred_joints, joints[..., :2], t=pck_t,
                     threshold="proportion")
        if joints.shape[-1] > 2:
            epe_sum, epe_cnt = epe_visible(pred_joints, joints)
        else:
            epe_sum, epe_cnt = epe_train(pred_joints, joints)
        return {
            "loss": loss,
            "pck": pck,
            "epe_sum": epe_sum,
            "epe_count": epe_cnt,
            "pred_joints": pred_joints,
        }

    return eval_step


def make_predict_step(stride: float = 4.0):
    """Inference: images -> decoded joints in input-image space (the
    pred_store path, argparser.py:246-281, minus the host roundtrip)."""

    @jax.jit
    def predict_step(state, images):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred = state.apply_fn(variables, images, train=False)
        pred_nchw = jnp.transpose(pred, (0, 3, 1, 2))
        pred_joints, maxvals = get_max_preds(pred_nchw)
        return pred_joints * stride, maxvals

    return predict_step
