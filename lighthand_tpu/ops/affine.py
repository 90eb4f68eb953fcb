"""Affine crop/rotate geometry + on-device bilinear warp.

The reference builds center/scale affine transforms on the host and crops
with cv2 (src/utils/image_ops.py:59-131: ``get_transform``/``transform``/
``crop``). Here the same 3x3 transform algebra is kept (so keypoint
coordinates match), but the image resample is a single vectorized inverse
bilinear warp that runs on-device — one fused gather instead of
pad -> warpAffine -> unpad -> resize on 8 CPU workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Transform algebra (host/numpy + jnp compatible)
# --------------------------------------------------------------------------

def get_transform(center, scale, res, rot: float = 0.0) -> np.ndarray:
    """3x3 matrix mapping original-image pixels -> res-space pixels.

    Matches reference image_ops.py:59-83: the crop box side is 200*scale
    pixels centered at ``center``; optional rotation about the output center
    (note the reference negates rot to match cropping direction).
    """
    center = np.asarray(center, dtype=np.float64)
    h = 200.0 * float(scale)
    t = np.zeros((3, 3), dtype=np.float64)
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-center[0] / h + 0.5)
    t[1, 2] = res[0] * (-center[1] / h + 0.5)
    t[2, 2] = 1.0
    if rot != 0:
        rr = -np.deg2rad(rot)
        sn, cs = np.sin(rr), np.cos(rr)
        rot_mat = np.zeros((3, 3), dtype=np.float64)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        rot_mat[2, 2] = 1.0
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2
        t_mat[1, 2] = -res[0] / 2
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def transform_point(pt, center, scale, res, invert: int = 0, rot: float = 0.0):
    """Transform one pixel location; reference-exact including the 1-based
    offsets and int truncation (image_ops.py:85-95)."""
    t = get_transform(center, scale, res, rot=rot)
    if invert:
        t = np.linalg.inv(t)
    new_pt = np.array([pt[0] - 1.0, pt[1] - 1.0, 1.0])
    new_pt = t @ new_pt
    return new_pt[:2].astype(int) + 1


def transform_points_batch(pts: np.ndarray, center, scale, res, rot=0.0) -> np.ndarray:
    """Vectorized ``transform_point`` over [N, 2] points (forward only)."""
    t = get_transform(center, scale, res, rot=rot)
    homo = np.concatenate(
        [pts[:, :2] - 1.0, np.ones((pts.shape[0], 1))], axis=1
    )
    out = homo @ t.T
    return out[:, :2].astype(int) + 1


def crop_transform_matrix(center, scale, res, rot: float = 0.0) -> np.ndarray:
    """Matrix mapping OUTPUT pixel coords -> INPUT pixel coords (for the
    inverse warp below): the inverse of ``get_transform``."""
    return np.linalg.inv(get_transform(center, scale, res, rot=rot))


def rotation_about_center(h: float, w: float, degrees: float,
                          translate=(0.0, 0.0)) -> np.ndarray:
    """Output->input matrix for rotation about the image center followed by
    translation — the LightHand generator's ``i_rotate`` semantics
    (src/tools/dataset.py:326-337), expressed as one inverse warp."""
    cx, cy = int(w / 2), int(h / 2)
    rad = np.deg2rad(degrees)
    cs, sn = np.cos(rad), np.sin(rad)
    # forward: p_out = R(p_in - c) + c + t  (cv2 rotates CCW for +deg)
    fwd = np.array(
        [[cs, sn, (1 - cs) * cx - sn * cy + translate[0]],
         [-sn, cs, sn * cx + (1 - cs) * cy + translate[1]],
         [0, 0, 1]],
        dtype=np.float64,
    )
    return np.linalg.inv(fwd)


# --------------------------------------------------------------------------
# On-device warps
# --------------------------------------------------------------------------

def affine_warp(image: jnp.ndarray, mat_out_to_in: jnp.ndarray,
                out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear inverse warp of an HWC image on-device.

    ``mat_out_to_in`` is a 3x3 (or 2x3) matrix taking output (x, y, 1) to
    input (x, y). Out-of-bounds samples are zero (black border, like cv2's
    default borderValue=0 in image_ops.py:43).
    """
    h_out, w_out = out_hw
    h_in, w_in = image.shape[0], image.shape[1]
    m = jnp.asarray(mat_out_to_in, dtype=jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (h_out, w_out), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h_out, w_out), 0)
    x_in = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    y_in = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]

    x0 = jnp.floor(x_in)
    y0 = jnp.floor(y_in)
    wx = x_in - x0
    wy = y_in - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w_in) & (yi >= 0) & (yi < h_in)
        xi_c = jnp.clip(xi, 0, w_in - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h_in - 1).astype(jnp.int32)
        vals = image[yi_c, xi_c]  # [H, W, C]
        return vals * valid[..., None].astype(image.dtype)

    img_f = image.astype(jnp.float32)

    def gather_f(yi, xi):
        valid = (xi >= 0) & (xi < w_in) & (yi >= 0) & (yi < h_in)
        xi_c = jnp.clip(xi, 0, w_in - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h_in - 1).astype(jnp.int32)
        return img_f[yi_c, xi_c] * valid[..., None].astype(jnp.float32)

    del gather  # single float path keeps XLA fusion simple
    v00 = gather_f(y0, x0)
    v01 = gather_f(y0, x0 + 1)
    v10 = gather_f(y0 + 1, x0)
    v11 = gather_f(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def affine_warp_batch(images: jnp.ndarray, mats: jnp.ndarray,
                      out_hw: tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] x [B, 3, 3] -> [B, h, w, C]."""
    return jax.vmap(lambda im, m: affine_warp(im, m, out_hw))(images, mats)


def resize_bilinear(image: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Plain bilinear resize (torchvision Resize equivalent), on-device."""
    return jax.image.resize(
        image.astype(jnp.float32),
        (out_hw[0], out_hw[1], image.shape[-1]),
        method="bilinear",
    )


# --------------------------------------------------------------------------
# Flip augmentation (consumed by train/step.py's ``--flip`` extension).
# The reference's flip helpers (image_ops.py:173-200) are permanently
# disabled (frei_dataloader.py:107 pins flip=0) and use an SMPL *body*
# joint permutation that is wrong for hands — we implement the correct
# hand mirror instead: joint ORDER is preserved (mirroring swaps
# handedness, not finger order), only x reflects.
# --------------------------------------------------------------------------

# A hand mirror is identity on joint order — x reflection only:
HAND_FLIP_PERM = list(range(21))


def flip_img(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(img, axis=1)


def rotate_px_batch(images: jnp.ndarray, joints: jnp.ndarray,
                    degrees: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample rotation about the image center: NHWC batch warped with
    the batched inverse bilinear warp, pixel-space joints rotated forward
    (p' = R (p - c) + c). ``degrees`` is [B]; extra joint columns
    (visibility) pass through. Device-side equivalent of the reference's
    host cv2 rotation (image_ops.py:110-118)."""
    h, w = images.shape[1], images.shape[2]
    rad = jnp.deg2rad(degrees.astype(jnp.float32))
    cs, sn = jnp.cos(rad), jnp.sin(rad)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0

    x = joints[..., 0] - cx
    y = joints[..., 1] - cy
    jx = cs[:, None] * x - sn[:, None] * y + cx
    jy = sn[:, None] * x + cs[:, None] * y + cy
    joints = jnp.concatenate(
        [jx[..., None], jy[..., None], joints[..., 2:]], axis=-1)

    zeros = jnp.zeros_like(cs)
    ones = jnp.ones_like(cs)
    # out->in matrix = R(-theta) about the center
    m = jnp.stack([
        jnp.stack([cs, sn, cx - cs * cx - sn * cy], axis=-1),
        jnp.stack([-sn, cs, cy + sn * cx - cs * cy], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=1)  # [B, 3, 3]
    return affine_warp_batch(images, m, (h, w)), joints


def hflip_px(images: jnp.ndarray, joints: jnp.ndarray,
             flip_mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample horizontal flip of an NHWC batch + pixel-space joints.

    ``flip_mask`` is a boolean [B]; joints [B, J, 2+] keep any extra
    columns (visibility) untouched. x -> (W-1) - x under the hand
    permutation (HAND_FLIP_PERM, identity)."""
    f = flip_mask.astype(bool)
    images = jnp.where(f[:, None, None, None], jnp.flip(images, axis=2),
                       images)
    width = images.shape[2]
    perm = jnp.asarray(HAND_FLIP_PERM)
    fx = (width - 1.0) - joints[:, perm, 0]
    x = jnp.where(f[:, None], fx, joints[..., 0])
    joints = jnp.concatenate([x[..., None], joints[..., 1:]], axis=-1)
    return images, joints
