import numpy as np
import jax
import jax.numpy as jnp

from lighthand_tpu.ops.affine import (
    affine_warp,
    crop_transform_matrix,
    get_transform,
    rotation_about_center,
    transform_point,
)
from lighthand_tpu.ops.color import (
    adjust_brightness,
    adjust_hue,
    color_jitter,
    denormalize_imagenet,
    normalize_imagenet,
)


def test_get_transform_identity_box():
    # center at box center, scale such that 200*scale == res -> identity-ish
    t = get_transform((128, 128), 1.28, (256, 256))
    p = np.array([50.0, 80.0, 1.0])
    out = t @ p
    np.testing.assert_allclose(out[:2], [50.0, 80.0], atol=1e-9)


def test_transform_point_invert_roundtrip():
    center, scale, res = (100, 120), 0.9, (224, 224)
    pt = np.array([60, 70])
    fwd = transform_point(pt, center, scale, res)
    back = transform_point(fwd, center, scale, res, invert=1)
    # int truncation costs up to ~2px over a round trip
    assert np.abs(back - pt).max() <= 2


def test_affine_warp_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    out = affine_warp(jnp.asarray(img), jnp.eye(3), (32, 32))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_affine_warp_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, size=(64, 64, 3)).astype(np.float32)
    mat = rotation_about_center(64, 64, degrees=17.0, translate=(3.0, -2.0))
    got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(mat), (64, 64)))
    # cv2.warpAffine takes the FORWARD matrix; ours is inverse -> invert back
    fwd = np.linalg.inv(np.vstack([mat[:2], [0, 0, 1]]))
    want = cv2.warpAffine(img, fwd[:2], (64, 64), flags=cv2.INTER_LINEAR)
    inner = (slice(8, 56), slice(8, 56))  # borders differ (cv2 clamps edges)
    assert np.abs(got[inner] - want[inner]).mean() < 1.0


def test_crop_transform_matrix_is_inverse():
    t = get_transform((80, 90), 0.7, (224, 224), rot=25.0)
    inv = crop_transform_matrix((80, 90), 0.7, (224, 224), rot=25.0)
    np.testing.assert_allclose(t @ inv, np.eye(3), atol=1e-9)


def test_normalize_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32)
    out = denormalize_imagenet(normalize_imagenet(jnp.asarray(img)))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_brightness_factor_one_is_identity():
    img = jnp.full((4, 4, 3), 0.5)
    np.testing.assert_allclose(
        np.asarray(adjust_brightness(img, jnp.asarray(1.0))), 0.5)


def test_hue_shift_full_circle_identity():
    rng = np.random.default_rng(3)
    img = rng.uniform(0.1, 0.9, size=(8, 8, 3)).astype(np.float32)
    out = adjust_hue(jnp.asarray(img), jnp.asarray(1.0))  # +1.0 == identity
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)


def test_color_jitter_disabled_is_identity():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    out = color_jitter(jax.random.PRNGKey(0), jnp.asarray(img), enable=False)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_color_jitter_changes_image():
    rng = np.random.default_rng(5)
    img = rng.uniform(0.2, 0.8, size=(16, 16, 3)).astype(np.float32)
    out = color_jitter(jax.random.PRNGKey(7), jnp.asarray(img), enable=True)
    assert not np.allclose(np.asarray(out), img, atol=1e-3)
    assert float(jnp.min(out)) >= 0.0


def test_freeze_mask_and_masked_optimizer():
    import optax

    from lighthand_tpu.utils.misc import freeze_mask, masked_optimizer

    params = {"backbone": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    mask = freeze_mask(params, [r"backbone"])
    assert mask["backbone"]["w"] is False or mask["backbone"]["w"] == False  # noqa: E712
    assert mask["head"]["w"] == True  # noqa: E712

    tx = masked_optimizer(optax.sgd(1.0), mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["w"]), 0.0)
    np.testing.assert_allclose(np.asarray(updates["head"]["w"]), -1.0)
