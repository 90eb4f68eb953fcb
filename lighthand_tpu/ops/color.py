"""On-device color augmentation + normalization.

Replaces the torchvision ColorJitter(0.5, 0.5, 0.5, 0.5) branch of the
LightHand dataset (src/tools/dataset.py:134-146) and the FreiHAND
per-channel pixel noise (src/datasets/frei_dataloader.py:118,142-144) with
vectorized jnp that fuses into the device-side input pipeline.

Semantics follow torchvision: factors drawn uniformly from
[max(0, 1-b), 1+b] for brightness/contrast/saturation and [-h, h] for hue;
the four sub-transforms are applied in a random order. Images are float in
[0, 1], channels last.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# NB: plain tuple, converted inside the (jitted) callers — a module-level
# jnp.array would dispatch to the default backend at IMPORT time, which on
# this box means a wedged tunnel blocks `import lighthand_tpu.cli.train`
# itself, before any --platform override or reachability gate can run.
_GRAY_W = (0.299, 0.587, 0.114)


def normalize_imagenet(img: jnp.ndarray) -> jnp.ndarray:
    """(img - mean) / std per channel; img [..., 3] float in [0,1]."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (img.astype(jnp.float32) - mean) / std


def denormalize_imagenet(img: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return img.astype(jnp.float32) * std + mean


def adjust_brightness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    # torchvision blends with the mean of the grayscale image.
    gray_mean = jnp.mean(img @ jnp.asarray(_GRAY_W, jnp.float32))
    return jnp.clip(gray_mean + factor * (img - gray_mean), 0.0, 1.0)


def adjust_saturation(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    gray = (img @ jnp.asarray(_GRAY_W, jnp.float32))[..., None]
    return jnp.clip(gray + factor * (img - gray), 0.0, 1.0)


def adjust_hue(img: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Shift hue by delta (fraction of the full circle), via RGB<->HSV."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    spread = maxc - minc
    s = jnp.where(maxc > 0, spread / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(spread, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(spread > 0, h, 0.0)

    h = (h + delta) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                       [v, q, p, p, t, v])
    g_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                       [t, v, v, q, p, p])
    b_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                       [p, p, t, v, v, q])
    return jnp.stack([r_out, g_out, b_out], axis=-1)


def color_jitter(
    key: jax.Array,
    img: jnp.ndarray,
    brightness: float = 0.5,
    contrast: float = 0.5,
    saturation: float = 0.5,
    hue: float = 0.5,
    enable: jnp.ndarray | bool = True,
) -> jnp.ndarray:
    """torchvision-style ColorJitter for one HWC float image in [0,1].

    ``enable`` allows branchless per-sample gating (the LightHand dataset
    jitters only a prefix fraction of samples, dataset.py:134).
    """
    k_order, kb, kc, ks, kh = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    ops = [
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, fh),
    ]
    perm = jax.random.permutation(k_order, 4)

    out = img.astype(jnp.float32)
    for slot in range(4):
        out = jax.lax.switch(perm[slot], ops, out)

    enable_f = jnp.asarray(enable, jnp.float32)
    return out * enable_f + img.astype(jnp.float32) * (1.0 - enable_f)


def channel_pixel_noise(key: jax.Array, img: jnp.ndarray,
                        noise_factor: float = 0.4,
                        enable: jnp.ndarray | bool = True) -> jnp.ndarray:
    """FreiHAND per-channel multiplicative noise in
    [1-nf, 1+nf], clipped to [0,1] (frei_dataloader.py:118,142-144;
    the reference clips in 0..255 space before the /255).

    ``enable`` gates the noise per sample branchlessly (frei train samples
    set it; every other dataset leaves it 0)."""
    pn = jax.random.uniform(key, (3,), minval=1 - noise_factor,
                            maxval=1 + noise_factor)
    enable_f = jnp.asarray(enable, jnp.float32)
    pn = pn * enable_f + (1.0 - enable_f)
    return jnp.clip(img * pn, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("brightness", "contrast",
                                             "saturation", "hue"))
def color_jitter_batch(key, imgs, enable,
                       brightness=0.5, contrast=0.5,
                       saturation=0.5, hue=0.5):
    keys = jax.random.split(key, imgs.shape[0])
    fn = functools.partial(color_jitter, brightness=brightness,
                           contrast=contrast, saturation=saturation, hue=hue)
    return jax.vmap(fn)(keys, imgs, enable=enable)
