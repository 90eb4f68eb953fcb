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
from lighthand_tpu.ops.heatmap import (
    generate_heatmap_max_batch,
    generate_target_batch,
)
from lighthand_tpu.ops.metrics import (
    epe_train,
    epe_visible,
    joints_mse_loss,
    pck_2d,
    pck_2d_counts,
)

Batch = Dict[str, jnp.ndarray]  # image [B,H,W,3] f32, joints [B,21,2(+1)]

TARGET_STYLES = ("msra", "max", "per_sample")


def make_targets(joints_px: jnp.ndarray, *, style: str = "msra",
                 heatmap_size: int = 64, stride: float = 4.0,
                 sigma: float = 2.0,
                 hm_max: jnp.ndarray | None = None) -> jnp.ndarray:
    """Route target rasterization by dataset style (SURVEY.md components
    18/19): "msra" = generate_target (src/tools/dataset.py:165-212); "max" =
    GenerateHeatmap max-combine on joints/stride (frei_dataloader.py:17-46,
    consumed by GAN at dataset_loader.py:509 and the Armo train/val phases);
    "per_sample" selects by the batch's ``hm_max`` mask (mixed-source
    loaders, e.g. the ConcatSource mix route)."""
    if style not in TARGET_STYLES:
        raise ValueError(f"style must be one of {TARGET_STYLES}, got {style}")
    joints_px = joints_px[..., :2]
    if style == "msra":
        return generate_target_batch(joints_px, heatmap_size, stride, sigma)
    if style == "max":
        return generate_heatmap_max_batch(joints_px / stride, heatmap_size)
    msra = generate_target_batch(joints_px, heatmap_size, stride, sigma)
    mx = generate_heatmap_max_batch(joints_px / stride, heatmap_size)
    sel = hm_max.astype(jnp.float32)[:, None, None, None]
    return mx * sel + msra * (1.0 - sel)


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
                          scan_steps: int = 1,
                          target_style: str = "msra",
                          flip: bool = False,
                          rot_deg: float = 0.0,
                          compute_dtype=jnp.bfloat16,
                          use_pallas_aug: bool | None = None):
    """Fully-fused train step: uint8 batch in, preprocess (per-sample color
    jitter + frei channel noise + normalize, ops/color.py) inside the jit,
    optional ``lax.scan`` over ``scan_steps`` pre-staged microbatches.

    vs the plain ``make_train_step``:
    - H2D traffic drops 4x (uint8 crosses the wire, f32 never exists in
      HBM — the normalize emits bf16 straight into the first conv);
    - with scan_steps>1, one Python dispatch drives K optimizer steps
      (on v5e: bs128 K=4 -> +5% over per-step dispatch).

    Per-sample augmentation gates (dataset-routed, data/registry.py):
    - ``aug_enabled``  -> torchvision-style ColorJitter (LightHand prefix
      fraction, src/tools/dataset.py:134-146);
    - ``noise_enabled`` -> per-channel pixel noise in [0.6, 1.4] (FreiHAND,
      frei_dataloader.py:118,142-144); absent key == all zeros.
    ``target_style`` routes MSRA vs max-combine rasterization (see
    ``make_targets``); "per_sample" additionally consumes batch["hm_max"].
    ``flip=True`` adds random horizontal flips (p=0.5; image mirrored,
    joint x -> W-1-x) — a TPU extension; the reference's flip is
    permanently disabled (frei_dataloader.py:107) and uses an SMPL body
    joint ordering (image_ops.py:180-200). ``rot_deg>0`` adds per-sample
    on-device rotation in [-rot_deg, rot_deg] (batched inverse warp,
    ops/affine.py:affine_warp_batch).

    Returns step(state, key, batch) -> (state, metrics) where batch has
    image_u8 [K?, B, H, W, 3] u8, joints [K?, B, 21, 2], aug_enabled /
    noise_enabled [K?, B] (leading K only when scan_steps > 1).
    Donates state.
    """
    import functools as _functools

    from lighthand_tpu.ops.color import (
        channel_pixel_noise,
        color_jitter,
        normalize_imagenet,
    )

    # The Pallas fused aug+target kernel (ops/pallas/fused_aug.py) is 3.1x
    # faster than the jnp chain at bs128@256 (measured on v5e; preprocess
    # is ~7% of the HRNet step, so this is worth ~+5% end to end). It
    # covers exactly the default path: jitter+noise -> bf16 NHWC + MSRA
    # targets, no flip/rot. Everything else falls back to the jnp chain.
    if use_pallas_aug is None:
        flags_ok = (jitter and target_style == "msra" and not flip
                    and rot_deg <= 0 and compute_dtype == jnp.bfloat16)
        on_accelerator = jax.devices()[0].platform not in ("cpu",)
        use_pallas_aug = flags_ok and on_accelerator
        if on_accelerator and not flags_ok:
            # Say so once at step build — a user benchmarking with
            # --rot-aug/--flip/f32/non-msra targets should know the fused
            # kernel (+3.6% end to end) is off for this run.
            import logging

            logging.getLogger("lighthand_tpu").warning(
                "fused Pallas aug+target kernel disabled for this step "
                "(requires jitter + msra targets + bf16, no flip/rot); "
                "using the jnp preprocess chain")
    if use_pallas_aug:
        from lighthand_tpu.ops.pallas.fused_aug import (
            fused_aug_targets_pallas,
        )

    def _preprocess_raw(key, images_u8, aug_enabled, noise_enabled):
        """uint8 -> [0,1] float with per-sample jitter/noise applied."""
        imgs = images_u8.astype(jnp.float32) / 255.0
        k_jit, k_noise = jax.random.split(key)
        if jitter:
            keys = jax.random.split(k_jit, imgs.shape[0])
            imgs = jax.vmap(color_jitter)(keys, imgs, enable=aug_enabled)
        if noise_enabled is not None:
            nkeys = jax.random.split(k_noise, imgs.shape[0])
            imgs = jax.vmap(
                lambda k, im, en: channel_pixel_noise(k, im, enable=en)
            )(nkeys, imgs, noise_enabled)
        return imgs

    def _maybe_flip(key, images, joints):
        if not flip:
            return images, joints
        from lighthand_tpu.ops.affine import hflip_px

        f = jax.random.bernoulli(key, 0.5, (images.shape[0],))
        return hflip_px(images, joints, f)

    def _maybe_rotate(key, images, joints):
        """On-device rotation aug (TPU extension, ``--rot-aug DEG``): each
        sample rotates uniformly in [-rot_deg, rot_deg] about the image
        center via the batched inverse bilinear warp (ops/affine.py) —
        the device-side equivalent of the reference's host cv2 rotation
        (image_ops.py:110-118). Applied in raw [0,1] space so the black
        border normalizes like the reference's."""
        if rot_deg <= 0:
            return images, joints
        from lighthand_tpu.ops.affine import rotate_px_batch

        deg = jax.random.uniform(key, (images.shape[0],),
                                 minval=-rot_deg, maxval=rot_deg)
        return rotate_px_batch(images, joints, deg)

    def _one(state, key, images_u8, joints, aug_enabled, noise_enabled,
             hm_max):
        if use_pallas_aug:
            noise = (noise_enabled if noise_enabled is not None
                     else jnp.zeros_like(aug_enabled))
            images, targets = fused_aug_targets_pallas(
                key, images_u8, joints[..., :2], aug_enabled, noise,
                heatmap_size=heatmap_size, stride=stride, sigma=sigma)
        else:
            k_pre, k_flip, k_rot = jax.random.split(key, 3)
            imgs = _preprocess_raw(k_pre, images_u8, aug_enabled,
                                   noise_enabled)
            imgs, joints = _maybe_rotate(k_rot, imgs, joints)
            # emit the model's compute dtype (bf16 halves the input's HBM
            # traffic; f32 policies keep full precision end to end)
            images = normalize_imagenet(imgs).astype(compute_dtype)
            images, joints = _maybe_flip(k_flip, images, joints)
            targets = make_targets(joints, style=target_style,
                                   heatmap_size=heatmap_size, stride=stride,
                                   sigma=sigma, hm_max=hm_max)

        def loss_fn(params):
            return _forward_loss(params, state.batch_stats, state.apply_fn,
                                 images, targets, train=True)

        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return state.apply_gradients(grads, new_stats), loss

    def _fields(batch):
        return (batch["image_u8"], batch["joints"], batch["aug_enabled"],
                batch.get("noise_enabled"),
                batch.get("hm_max") if target_style == "per_sample"
                else None)

    if scan_steps == 1:
        @_functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, key, batch):
            state, loss = _one(state, key, *_fields(batch))
            return state, {"loss": loss}

        return step

    @_functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, key, batch):
        keys = jax.random.split(key, scan_steps)
        fields = _fields(batch)

        def body(s, xs):
            k, present = xs[0], xs[1:]
            it = iter(present)
            args = [next(it) if f is not None else None for f in fields]
            s, loss = _one(s, k, *args)
            return s, loss

        xs = (keys,) + tuple(f for f in fields if f is not None)
        state, losses = jax.lax.scan(body, state, xs)
        return state, {"loss": jnp.mean(losses)}

    return step


def make_eval_step(heatmap_size: int = 64, stride: float = 4.0,
                   sigma: float = 2.0, pck_t: float = 0.2,
                   target_style: str = "msra"):
    """Returns eval_step(state, batch) -> metrics dict, all on-device.

    Mirrors the reference validation branch (method.py:218-287): loss,
    argmax decode x4, PCK(T=0.2, proportion), EPE — every statistic as a
    (sum, count) pair for exact weighted averaging via
    AverageMeter.update_p.

    batch["valid"] (optional, 0/1 per sample) masks the repeated-sample
    padding a drop_last=False loader appends to its final ragged batch
    (data/pipeline.py), so every real sample counts exactly once — the
    reference's DataLoader kept ragged tails instead.
    """

    @jax.jit
    def eval_step(state, batch: Batch):
        joints = batch["joints"]
        valid = batch.get("valid")
        bsz = joints.shape[0]
        w = (jnp.ones(bsz, jnp.float32) if valid is None
             else valid.astype(jnp.float32))
        targets = make_targets(joints, style=target_style,
                               heatmap_size=heatmap_size, stride=stride,
                               sigma=sigma, hm_max=batch.get("hm_max"))

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        pred = state.apply_fn(variables, batch["image"], train=False)
        # per-sample loss so padding rows can be masked exactly
        tgt = jnp.transpose(targets, (0, 2, 3, 1)).astype(jnp.float32)
        per_sample = 0.5 * jnp.mean(
            (pred.astype(jnp.float32) - tgt) ** 2, axis=(1, 2, 3))
        n_valid = jnp.sum(w)
        loss_sum = jnp.sum(per_sample * w)
        loss = loss_sum / jnp.maximum(n_valid, 1.0)

        # NHWC -> NCHW for decoding
        pred_nchw = jnp.transpose(pred, (0, 3, 1, 2))
        pred_joints, _ = get_max_preds(pred_nchw)
        pred_joints = pred_joints * stride  # 64 -> 256 space (method.py:157)

        pck_sum, pck_cnt = pck_2d_counts(pred_joints, joints[..., :2],
                                         t=pck_t, threshold="proportion",
                                         sample_weight=w)
        if joints.shape[-1] > 2:
            epe_sum, epe_cnt = epe_visible(pred_joints, joints,
                                           sample_weight=w)
        else:
            epe_sum, epe_cnt = epe_train(pred_joints, joints,
                                         sample_weight=w)
        return {
            "loss": loss,
            "loss_sum": loss_sum,
            "n_valid": n_valid,
            "pck": pck_sum / jnp.maximum(pck_cnt, 1.0),
            "pck_sum": pck_sum,
            "pck_count": pck_cnt,
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
