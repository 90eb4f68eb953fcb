"""Golden NumPy transcriptions of the reference math.

Each function here is a straight, loop-based NumPy statement of the
semantics documented in SURVEY.md section 2 (with file:line citations),
used ONLY as the test oracle for the vectorized on-device ops.
"""

from __future__ import annotations

import sys

import numpy as np


def golden_generate_target(joints: np.ndarray, heatmap_size=64, stride=4.0,
                           sigma=2.0):
    """Oracle for src/tools/dataset.py:165-212."""
    j = joints.shape[0]
    tmp = int(3 * sigma)
    weight = np.ones((j,), dtype=np.float32)
    target = np.zeros((j, heatmap_size, heatmap_size), dtype=np.float32)
    for jid in range(j):
        mu_x = int(joints[jid][0] / stride + 0.5)
        mu_y = int(joints[jid][1] / stride + 0.5)
        ul = [mu_x - tmp, mu_y - tmp]
        br = [mu_x + tmp + 1, mu_y + tmp + 1]
        if (ul[0] >= heatmap_size or ul[1] >= heatmap_size
                or br[0] < 0 or br[1] < 0):
            weight[jid] = 0
            continue
        size = 2 * tmp + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
        g_x = max(0, -ul[0]), min(br[0], heatmap_size) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], heatmap_size) - ul[1]
        img_x = max(0, ul[0]), min(br[0], heatmap_size)
        img_y = max(0, ul[1]), min(br[1], heatmap_size)
        target[jid][img_y[0]:img_y[1], img_x[0]:img_x[1]] = (
            g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
        )
    return target, weight


def golden_generate_heatmap_max(p: np.ndarray, output_res=64, num_parts=21):
    """Oracle for src/datasets/frei_dataloader.py:17-46."""
    sigma = output_res / 64
    size = int(6 * sigma + 3)
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = 3 * sigma + 1
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))

    hms = np.zeros((num_parts, output_res, output_res), dtype=np.float32)
    for idx, pt in enumerate(p):
        if pt[0] > 0:
            xx, yy = int(pt[0]), int(pt[1])
            if xx < 0 or yy < 0 or xx >= output_res or yy >= output_res:
                continue
            ul = int(xx - 3 * sigma - 1), int(yy - 3 * sigma - 1)
            br = int(xx + 3 * sigma + 2), int(yy + 3 * sigma + 2)
            c, d = max(0, -ul[0]), min(br[0], output_res) - ul[0]
            a, b = max(0, -ul[1]), min(br[1], output_res) - ul[1]
            cc, dd = max(0, ul[0]), min(br[0], output_res)
            aa, bb = max(0, ul[1]), min(br[1], output_res)
            hms[idx, aa:bb, cc:dd] = np.maximum(hms[idx, aa:bb, cc:dd],
                                                g[a:b, c:d])
    return hms


def golden_get_max_preds(batch_heatmaps: np.ndarray):
    """Oracle for src/utils/loss.py:327-355."""
    b, j, h, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(b, j, -1)
    idx = np.argmax(flat, 2).reshape(b, j, 1)
    maxvals = np.amax(flat, 2).reshape(b, j, 1)
    preds = np.tile(idx, (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % w
    preds[:, :, 1] = np.floor(preds[:, :, 1] / w)
    mask = np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    return preds * mask, maxvals


def golden_pck_2d(pred, gt, t=0.1, threshold="proportion"):
    """Oracle for src/utils/loss.py:116-148."""
    bbox = []
    for jnt in gt:
        width = jnt[:, 0].max() - jnt[:, 0].min()
        height = jnt[:, 1].max() - jnt[:, 1].min()
        bbox.append(np.sqrt(width**2 + height**2))
    diff = gt[..., :2] - pred[..., :2]
    dist = np.sqrt((diff**2).sum(-1))
    total = dist.size
    if threshold == "proportion":
        norm = dist.T / np.array(bbox)
        correct = total - (norm > t).sum()
    else:
        correct = total - (dist > t * 3.78).sum()
    return correct / total


def golden_pck_2d_visible(pred, gt_v, t=0.1, threshold="proportion"):
    """Oracle for src/utils/loss.py:83-114."""
    bbox = []
    for jnt in gt_v:
        width = jnt[:, 0].max() - jnt[:, 0].min()
        height = jnt[:, 1].max() - jnt[:, 1].min()
        bbox.append(np.sqrt(width**2 + height**2))
    gt_val = gt_v[:, 1:, :-1]
    vis = gt_v[:, 1:, -1] == 1
    pred_val = pred[:, 1:, :2]
    dist = np.sqrt(((gt_val - pred_val) ** 2).sum(2)) * vis
    num_vis = vis.sum()
    if threshold == "proportion":
        norm = dist.T / np.array(bbox)
        correct = num_vis - (norm > t).sum()
    else:
        correct = num_vis - (dist > t * 3.78).sum()
    return correct / (num_vis + sys.float_info.epsilon)


def golden_epe(pred, gt, visible_only: bool):
    """Oracle for src/utils/loss.py:28-67 (EPE / EPE_train): per-joint means
    over the batch for joints 1..J-1, then the aggregation loop
    ``for i in range(1, len(distance))`` which keeps joints 1..J-2."""
    b, j = pred.shape[0], pred.shape[1]
    distance = {}
    for i in range(1, j):
        errs = []
        for k in range(b):
            if visible_only and gt[k, i, 2] == 0:
                continue
            errs.append(np.sqrt(((pred[k, i, :2] - gt[k, i, :2]) ** 2).sum()))
        m = np.mean(errs) if errs else np.nan
        distance[str(i)] = [0 if np.isnan(m) else m, len(errs)]
    epe = [[distance[str(i)][0] * distance[str(i)][1], distance[str(i)][1]]
           for i in range(1, len(distance))]
    arr = np.array(epe)
    return arr[:, 0].sum(), arr[:, 1].sum()


def golden_similarity_transform(s1, s2):
    """Oracle for src/utils/metric_pampjpe.py:12-66 / loss.py:238-285."""
    transposed = False
    if s1.shape[0] not in (2, 3):
        s1, s2 = s1.T, s2.T
        transposed = True
    mu1 = s1.mean(axis=1, keepdims=True)
    mu2 = s2.mean(axis=1, keepdims=True)
    x1, x2 = s1 - mu1, s2 - mu2
    var1 = (x1**2).sum()
    k = x1 @ x2.T
    u, _, vh = np.linalg.svd(k)
    v = vh.T
    z = np.eye(u.shape[0])
    z[-1, -1] *= np.sign(np.linalg.det(u @ v.T))
    r = v @ z @ u.T
    scale = np.trace(r @ k) / (var1 + sys.float_info.epsilon)
    t = mu2 - scale * (r @ mu1)
    s1_hat = scale * r @ s1 + t
    return s1_hat.T if transposed else s1_hat
