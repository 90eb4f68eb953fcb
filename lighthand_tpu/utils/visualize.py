"""Prediction/GT overlay rendering.

Reference: visualize_gt/visualize_pred (src/utils/visualize.py:10-64) — draw
21 joints + 20 bones over the denormalized image, save to
{output_dir}/{train,val,eval}_image/{epoch}_epoch/iter_N.jpg, 3x per epoch.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from lighthand_tpu.ops.color import denormalize_imagenet

# parents array (visualize.py:15)
PARENTS = np.array(
    [-1, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19]
)

_FINGER_COLORS = [(255, 80, 80), (80, 255, 80), (80, 80, 255),
                  (255, 255, 80), (255, 80, 255)]


def draw_joints(image_u8: np.ndarray, joints: np.ndarray) -> np.ndarray:
    """Draw skeleton in-place-free; returns a copy with overlays."""
    import cv2

    img = np.ascontiguousarray(image_u8.copy())
    joints = np.asarray(joints)[:, :2]
    for j in range(21):
        x, y = int(joints[j, 0]), int(joints[j, 1])
        cv2.circle(img, (x, y), 2, (255, 255, 255), -1)
        p = PARENTS[j]
        if p >= 0:
            color = _FINGER_COLORS[(j - 1) // 4 % 5]
            px, py = int(joints[p, 0]), int(joints[p, 1])
            cv2.line(img, (px, py), (x, y), color, 1)
    return img


def save_overlay(
    normalized_image: np.ndarray,
    gt_joints: Optional[np.ndarray],
    pred_joints: Optional[np.ndarray],
    output_dir: str,
    phase: str,
    epoch: int,
    iteration: int,
) -> str:
    """Save a side-by-side GT/pred overlay like visualize.py (GT green-ish,
    pred colored); input is the ImageNet-normalized HWC float image."""
    import cv2

    img = np.asarray(denormalize_imagenet(normalized_image))
    img = np.clip(img * 255.0, 0, 255).astype(np.uint8)

    panels = []
    if gt_joints is not None:
        panels.append(draw_joints(img, gt_joints))
    if pred_joints is not None:
        panels.append(draw_joints(img, pred_joints))
    canvas = np.concatenate(panels, axis=1) if len(panels) > 1 else panels[0]

    out_dir = os.path.join(output_dir, f"{phase}_image", f"{epoch}_epoch")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"iter_{iteration}.jpg")
    cv2.imwrite(path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return path
