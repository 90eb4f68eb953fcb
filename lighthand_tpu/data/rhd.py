"""RHD (Rendered Handpose Dataset) source.

Reference: ``RHD`` (src/utils/dataset_loader.py:288-420). Pickle
annotations; K-matrix perspective projection; left-hand joints (rows 21:42);
samples whose segmentation-mask hand bbox is missing or smaller than 30 px
are filtered at load; a 0.4-margin square-ish crop around the joint extent;
joint reorder [0,4,3,2,1,8,...] to the wrist-first/thumb-first layout.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from lighthand_tpu.data.records import Sample, Source
from lighthand_tpu.data.lighthand import _resize

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

RHD_JOINT_ORDER = [0, 4, 3, 2, 1, 8, 7, 6, 5, 12, 11, 10, 9, 16, 15, 14, 13,
                   20, 19, 18, 17]


class RHDDataset(Source):
    def __init__(self, dataset_root: str, phase: str = "training",
                 image_size: int = 256, filter_small: bool = True):
        self.path = os.path.join(dataset_root, "RHD_published_v2")
        self.phase = phase
        self.image_size = image_size
        anno_path = os.path.join(self.path, phase, f"anno_{phase}.pickle")
        with open(anno_path, "rb") as f:
            raw = pickle.load(f)
        self.anno = []
        for idx in raw.keys():
            if filter_small and self._mask_too_small(idx):
                continue
            self.anno.append((idx, raw[idx]))

    def _mask_too_small(self, idx) -> bool:
        """dataset_loader.py:300-318: drop when mask pixels > 17 span < 30px."""
        mask_path = os.path.join(self.path, self.phase, "mask",
                                 f"{idx:05d}.png")
        seg = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        if seg is None:
            return True
        ys, xs = np.where(seg > 17)
        if len(xs) == 0:
            return True
        return (xs.max() - xs.min()) < 30 or (ys.max() - ys.min()) < 30

    def __len__(self):
        return len(self.anno)

    def __getitem__(self, i: int) -> Sample:
        idx, rec = self.anno[i]
        img = cv2.cvtColor(
            cv2.imread(os.path.join(self.path, self.phase, "color",
                                    f"{idx:05d}.png")),
            cv2.COLOR_BGR2RGB,
        )
        # project: K @ xyz, perspective divide; take the left hand rows 21:
        proj = (rec["K"] @ rec["xyz"].T).T
        joint = proj / proj[:, -1:].reshape(-1, 1)
        joint = joint[21:]

        h_min, w_min = joint[:, 1].min(), joint[:, 0].min()
        h_max, w_max = joint[:, 1].max(), joint[:, 0].max()
        spare = int(max(w_max - w_min, h_max - h_min) * 0.4)
        # reference swaps max/min roles in its clipping (dataset_loader.py:
        # 336-339) — we clip correctly to the image bounds.
        s_h_min = max(int(h_min - spare), 0)
        s_h_max = min(int(h_max + spare), img.shape[0])
        s_w_min = max(int(w_min - spare), 0)
        s_w_max = min(int(w_max + spare), img.shape[1])
        crop = img[s_h_min:s_h_max, s_w_min:s_w_max]

        joint = joint.copy()
        joint[:, 1] = (joint[:, 1] - s_h_min) / max(s_h_max - s_h_min, 1)
        joint[:, 0] = (joint[:, 0] - s_w_min) / max(s_w_max - s_w_min, 1)
        joint = joint[RHD_JOINT_ORDER, :2] * self.image_size

        return Sample(image=_resize(crop, self.image_size),
                      joints=joint.astype(np.float32))
