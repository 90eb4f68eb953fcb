import numpy as np
import jax.numpy as jnp

from lighthand_tpu.ops import (
    bbox_diagonal,
    pck_2d,
    pck_2d_visible,
    epe_train,
    epe_visible,
    joints_mse_loss,
    reconstruction_error,
    compute_similarity_transform,
)
from tests.golden import (
    golden_pck_2d,
    golden_pck_2d_visible,
    golden_epe,
    golden_similarity_transform,
)


def _fake_batch(rng, b=8, j=21):
    gt = rng.uniform(10, 246, size=(b, j, 2)).astype(np.float32)
    pred = gt + rng.normal(scale=8.0, size=(b, j, 2)).astype(np.float32)
    vis = (rng.uniform(size=(b, j)) > 0.25).astype(np.float32)
    gt_v = np.concatenate([gt, vis[..., None]], axis=-1)
    return pred, gt, gt_v


def test_bbox_diagonal(rng):
    _, gt, _ = _fake_batch(rng)
    want = [np.sqrt((gt[i, :, 0].max() - gt[i, :, 0].min()) ** 2
                    + (gt[i, :, 1].max() - gt[i, :, 1].min()) ** 2)
            for i in range(gt.shape[0])]
    np.testing.assert_allclose(np.asarray(bbox_diagonal(jnp.asarray(gt))),
                               want, rtol=1e-6)


def test_pck_2d_matches_reference(rng):
    pred, gt, _ = _fake_batch(rng)
    for t in (0.05, 0.2, 0.5):
        want = golden_pck_2d(pred, gt, t=t, threshold="proportion")
        got = float(pck_2d(jnp.asarray(pred), jnp.asarray(gt), t=t))
        assert abs(got - want) < 1e-6
    for t in (5.0, 15.0):
        want = golden_pck_2d(pred, gt, t=t, threshold="mm")
        got = float(pck_2d(jnp.asarray(pred), jnp.asarray(gt), t=t,
                           threshold="mm"))
        assert abs(got - want) < 1e-6


def test_pck_2d_visible_matches_reference(rng):
    pred, _, gt_v = _fake_batch(rng)
    for t in (0.1, 0.3):
        want = golden_pck_2d_visible(pred, gt_v, t=t)
        got = float(pck_2d_visible(jnp.asarray(pred), jnp.asarray(gt_v), t=t))
        assert abs(got - want) < 1e-5


def test_epe_train_matches_reference(rng):
    pred, gt, _ = _fake_batch(rng)
    want_sum, want_cnt = golden_epe(pred, gt, visible_only=False)
    got_sum, got_cnt = epe_train(jnp.asarray(pred), jnp.asarray(gt))
    assert abs(float(got_sum) - want_sum) < 1e-2
    assert float(got_cnt) == want_cnt


def test_epe_visible_matches_reference(rng):
    pred, _, gt_v = _fake_batch(rng)
    want_sum, want_cnt = golden_epe(pred, gt_v, visible_only=True)
    got_sum, got_cnt = epe_visible(jnp.asarray(pred), jnp.asarray(gt_v))
    assert abs(float(got_sum) - want_sum) < 1e-2
    assert float(got_cnt) == want_cnt


def test_epe_drops_wrist_and_last_joint(rng):
    """The reference aggregation keeps joints 1..19 of 21 (loss.py:44)."""
    pred, gt, _ = _fake_batch(rng, b=4)
    # Corrupt wrist (0) and pinky tip (20): EPE must not change.
    pred2 = pred.copy()
    pred2[:, 0] += 1e5
    pred2[:, 20] += 1e5
    s1, c1 = epe_train(jnp.asarray(pred), jnp.asarray(gt))
    s2, c2 = epe_train(jnp.asarray(pred2), jnp.asarray(gt))
    assert float(c1) == float(c2) == 4 * 19
    assert abs(float(s1) - float(s2)) < 1e-3


def test_joints_mse_loss_equals_per_joint_split(rng):
    pred = rng.normal(size=(4, 21, 64, 64)).astype(np.float32)
    target = rng.normal(size=(4, 21, 64, 64)).astype(np.float32)
    # reference: sum over joints of 0.5*MSE(joint) / num_joints
    per_joint = [0.5 * np.mean((pred[:, j] - target[:, j]) ** 2)
                 for j in range(21)]
    want = np.sum(per_joint) / 21
    got = float(joints_mse_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert abs(got - want) / want < 1e-4  # f32 reduction vs f64 oracle


def test_similarity_transform_matches_reference(rng):
    s2 = rng.normal(size=(21, 3)).astype(np.float64)
    # s1 = a randomly rotated/scaled/translated copy + noise
    theta = 0.7
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]])
    s1 = (1.7 * s2 @ r.T + np.array([5.0, -3.0, 2.0])
          + rng.normal(scale=0.01, size=(21, 3)))
    want = golden_similarity_transform(s1.copy(), s2.copy())
    got = np.asarray(compute_similarity_transform(jnp.asarray(s1),
                                                  jnp.asarray(s2)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)  # f32 SVD
    # and the aligned error is tiny
    err = float(reconstruction_error(jnp.asarray(s1)[None],
                                     jnp.asarray(s2)[None]))
    assert err < 0.05
