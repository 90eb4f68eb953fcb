"""Training/validation metrics — pure jnp, run on-device inside the eval step.

Reference semantics reproduced exactly (including their sharp edges — see
SURVEY.md section 7 "hard parts"):

- ``pck_2d``          <- PCK_2d_loss            (src/utils/loss.py:116-148)
- ``pck_2d_visible``  <- PCK_2d_loss_visible    (src/utils/loss.py:83-114)
- ``pck_curve``       <- PCK_2d_loss_list       (src/utils/loss.py:150-202)
- ``epe_train``       <- EPE_train              (src/utils/loss.py:50-67)
- ``epe_visible``     <- EPE                    (src/utils/loss.py:28-47)
- ``joints_mse_loss`` <- JointsMSELoss.forward  (src/utils/loss.py:306-325)

Notable quirks kept for parity:
- the EPE aggregation indexes ``range(1, len(distance))`` over a dict keyed
  '1'..'20', so joints 1..19 contribute and joint 20 (pinky tip) is dropped
  (loss.py:44); wrist (joint 0) is skipped by construction (loss.py:32);
- PCK counts a prediction as correct when its normalized distance is NOT
  strictly greater than T (loss.py:104,138);
- the mm-mode threshold scale is exactly 3.78 px/mm (loss.py:107,141,179).
"""

from __future__ import annotations

import jax.numpy as jnp

# px->mm constants used at different call sites of the reference; see
# BASELINE.md "Evaluation constants".
MM_SCALE_PCK = 3.78               # loss.py:107,141,179
PX_TO_MM_EVAL = 3.7795275591      # argparser.py:377,386,399
MM_THRESH_SCALE_EVAL = 2.83464567  # argparser.py:336
PX_TO_MM_VALID_LOG = 0.26         # method.py:131


def bbox_diagonal(gt_2d: jnp.ndarray) -> jnp.ndarray:
    """Per-sample diagonal of the GT keypoint extent (loss.py:89-94).

    Args: gt_2d [B, J, >=2]. Returns [B] float32.
    """
    xy = gt_2d[..., :2].astype(jnp.float32)
    wh = jnp.max(xy, axis=1) - jnp.min(xy, axis=1)  # [B, 2]
    return jnp.sqrt(jnp.sum(wh**2, axis=-1))


def joints_mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.5 * MSE, averaged per joint then over joints == 0.5 * global MSE
    (the reference's per-joint split/sum at loss.py:315-325 reduces to this
    because every joint map has identical size)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return 0.5 * jnp.mean((pred - target) ** 2)


def pck_2d(
    pred_2d: jnp.ndarray,
    gt_2d: jnp.ndarray,
    t: float = 0.1,
    threshold: str = "proportion",
) -> jnp.ndarray:
    """PCK over all joints (wrist included), bbox-diagonal normalized.

    pred_2d/gt_2d: [B, J, 2]. Correct iff distance (normalized in
    'proportion' mode) is <= T; mm mode compares raw px distance to
    T * 3.78 (loss.py:116-148). Returns scalar in [0, 1].
    """
    pred = pred_2d[..., :2].astype(jnp.float32)
    gt = gt_2d[..., :2].astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1))  # [B, J]
    if threshold == "proportion":
        norm = dist / bbox_diagonal(gt)[:, None]
        correct = norm <= t
    elif threshold == "mm":
        correct = dist <= (t * MM_SCALE_PCK)
    else:
        raise ValueError(f"threshold must be proportion|mm, got {threshold}")
    return jnp.mean(correct.astype(jnp.float32))


def pck_2d_counts(
    pred_2d: jnp.ndarray,
    gt_2d: jnp.ndarray,
    t: float = 0.1,
    threshold: str = "proportion",
    sample_weight: jnp.ndarray | None = None,
):
    """(n_correct, n_total) form of ``pck_2d`` for weighted accumulation
    across batches — with ``sample_weight`` masking padded rows of a
    drop_last=False loader (each weight is 0 or 1 per sample)."""
    pred = pred_2d[..., :2].astype(jnp.float32)
    gt = gt_2d[..., :2].astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1))  # [B, J]
    if threshold == "proportion":
        correct = (dist / bbox_diagonal(gt)[:, None]) <= t
    elif threshold == "mm":
        correct = dist <= (t * MM_SCALE_PCK)
    else:
        raise ValueError(f"threshold must be proportion|mm, got {threshold}")
    correct = correct.astype(jnp.float32)
    n_joints = jnp.asarray(correct.shape[1], jnp.float32)
    if sample_weight is None:
        return jnp.sum(correct), jnp.asarray(correct.size, jnp.float32)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(correct * w[:, None]), jnp.sum(w) * n_joints


def pck_2d_visible(
    pred_2d: jnp.ndarray,
    gt_2d_v: jnp.ndarray,
    t: float = 0.1,
    threshold: str = "proportion",
) -> jnp.ndarray:
    """PCK over visible non-wrist joints (loss.py:83-114).

    gt_2d_v: [B, J, 3] with a 0/1 visibility column. The bbox diagonal is
    computed over ALL GT joints (visibility column excluded from min/max via
    [..., :2]; the reference includes only x,y too since it reads j[:,0],
    j[:,1]). Joints 1: are scored; invisible joints have distance forced to
    0 and are excluded from the denominator.
    """
    pred = pred_2d[:, 1:, :2].astype(jnp.float32)
    gt = gt_2d_v[:, 1:, :2].astype(jnp.float32)
    vis = (gt_2d_v[:, 1:, 2] == 1).astype(jnp.float32)
    diag = bbox_diagonal(gt_2d_v[..., :2])[:, None]

    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1)) * vis
    num_vis = jnp.sum(vis)
    if threshold == "proportion":
        incorrect = jnp.sum(((dist / diag) > t).astype(jnp.float32))
    elif threshold == "mm":
        incorrect = jnp.sum((dist > (t * MM_SCALE_PCK)).astype(jnp.float32))
    else:
        raise ValueError(f"threshold must be proportion|mm, got {threshold}")
    eps = jnp.finfo(jnp.float32).tiny
    return (num_vis - incorrect) / (num_vis + eps)


def pck_curve(
    pred_2d: jnp.ndarray,
    gt_2d: jnp.ndarray,
    thresholds: jnp.ndarray,
    threshold: str = "proportion",
) -> jnp.ndarray:
    """Vector of PCK values (in %) over a threshold grid (loss.py:150-202).
    Returns [T] float32."""
    pred = pred_2d[..., :2].astype(jnp.float32)
    gt = gt_2d[..., :2].astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1))
    if threshold == "proportion":
        norm = dist / bbox_diagonal(gt)[:, None]
    elif threshold == "mm":
        norm = dist / MM_SCALE_PCK
    else:
        raise ValueError(f"threshold must be proportion|mm, got {threshold}")
    # correct iff not strictly greater than T
    return 100.0 * jnp.mean(
        (norm[None, :, :] <= thresholds[:, None, None]).astype(jnp.float32),
        axis=(1, 2),
    )


def _epe_joint_slice(num_joints: int) -> slice:
    """Joints contributing to EPE: 1..J-2 inclusive (the reference drops the
    wrist by construction and the last joint via its range() off-by-one,
    loss.py:32,44)."""
    return slice(1, num_joints - 1)


def epe_train(pred_2d: jnp.ndarray, gt_2d: jnp.ndarray,
              sample_weight: jnp.ndarray | None = None):
    """EPE counting every joint in the slice regardless of visibility
    (loss.py:50-67). Returns (sum_px_error, count) for weighted averaging
    via AverageMeter.update_p (metric_logger.py:19-23). ``sample_weight``
    (0/1 per sample) masks padded rows."""
    j = pred_2d.shape[1]
    sl = _epe_joint_slice(j)
    pred = pred_2d[:, sl, :2].astype(jnp.float32)
    gt = gt_2d[:, sl, :2].astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1))
    if sample_weight is None:
        return jnp.sum(dist), jnp.asarray(dist.size, jnp.float32)
    w = sample_weight.astype(jnp.float32)
    n_joints = jnp.asarray(dist.shape[1], jnp.float32)
    return jnp.sum(dist * w[:, None]), jnp.sum(w) * n_joints


def epe_visible(pred_2d: jnp.ndarray, gt_2d_v: jnp.ndarray,
                sample_weight: jnp.ndarray | None = None):
    """EPE over visible joints only (loss.py:28-47). gt_2d_v: [B, J, 3]."""
    j = pred_2d.shape[1]
    sl = _epe_joint_slice(j)
    pred = pred_2d[:, sl, :2].astype(jnp.float32)
    gt = gt_2d_v[:, sl, :2].astype(jnp.float32)
    vis = (gt_2d_v[:, sl, 2] == 1).astype(jnp.float32)
    if sample_weight is not None:
        vis = vis * sample_weight.astype(jnp.float32)[:, None]
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1)) * vis
    return jnp.sum(dist), jnp.sum(vis)


# -- 3D metric surface (dormant in the reference's 2D path, kept for
# capability parity) ---------------------------------------------------------

PX_TO_MM_PCK3D = 3.779527559  # loss.py:210 (one digit fewer than eval's)


def pck_3d(pred_3d: jnp.ndarray, gt_3d: jnp.ndarray, t: float = 0.1):
    """PCK over 3D joints: distance scaled px->mm then compared <= T
    (reference PCK_3d_loss, src/utils/loss.py:205-213). Returns (pck, T)."""
    pred = pred_3d.astype(jnp.float32)
    gt = gt_3d.astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=2))
    pck = jnp.mean((dist * PX_TO_MM_PCK3D <= t).astype(jnp.float32))
    return pck, t


def keypoint_2d_loss(pred_2d: jnp.ndarray, gt_2d: jnp.ndarray) -> jnp.ndarray:
    """Visibility-masked elementwise-MSE keypoint loss (reference
    keypoint_2d_loss, src/utils/loss.py:69-80): with a visibility column the
    per-element losses are masked and averaged over the STRICTLY-POSITIVE
    entries only (the reference's ``loss[loss>0].mean()``)."""
    pred = pred_2d.astype(jnp.float32)
    gt = gt_2d.astype(jnp.float32)
    if gt.shape[2] > 2:
        err = (pred - gt[:, :, :2]) ** 2 * gt[:, :, 2][:, :, None]
        pos = (err > 0).astype(jnp.float32)
        return jnp.sum(err * pos) / jnp.maximum(jnp.sum(pos), 1.0)
    return jnp.mean((pred - gt) ** 2)


def keypoint_3d_loss(pred_3d: jnp.ndarray, gt_3d: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE over 3D keypoints (reference keypoint_3d_loss,
    src/utils/loss.py:225-236; its has-pose filtering is commented out there
    and the empty-gt branch is an assert False)."""
    if gt_3d.shape[0] == 0:
        raise ValueError("gt_3d_keypoint No")  # reference loss.py:236
    return jnp.mean((pred_3d.astype(jnp.float32)
                     - gt_3d.astype(jnp.float32)) ** 2)
