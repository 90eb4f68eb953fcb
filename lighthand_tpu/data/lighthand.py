"""LightHand99K ("ours") dataset: CISLAB JSON annotations + JPEG crops.

Reference: ``CustomDataset`` / ``val_set`` (src/tools/dataset.py:103-231).
Per item the reference does cv2 imread -> RGB, joints x (256/224), resize
256, [prefix-fraction ColorJitter], ImageNet normalize, Python heatmap
rasterization. Here the source only decodes + resizes to uint8; jitter/
normalize/heatmap run on device (data/pipeline.py, ops/).

Reference quirks handled (SURVEY.md section 7.6):
- ``__len__`` returned args.num_our regardless of actual metadata length
  (dataset.py:122-123, an IndexError waiting to happen) — here the length is
  min(num_our, len(meta));
- color jitter applies to the fixed PREFIX of the dataset, not a random
  subset (dataset.py:134) — preserved via ``aug_enabled = idx < len*ratio``.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from lighthand_tpu.data.records import Sample, Source

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape[0] == size and img.shape[1] == size:
        return img
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)


class LightHandDataset(Source):
    """phase in {train, val, eval}; reads
    {root}/LightHand/annotations/{phase}/CISLAB_{phase}_data.json, plus the
    {phase}2 shard when num_our > 150000 (dataset.py:115-120)."""

    def __init__(self, dataset_root: str, phase: str, *,
                 num_our: int = 300000, ratio_of_aug: float = 0.6,
                 image_size: int = 256):
        self.path = os.path.join(dataset_root, "LightHand")
        self.phase = phase
        self.image_size = image_size
        self.ratio_of_aug = ratio_of_aug

        anno = os.path.join(self.path, "annotations", phase,
                            f"CISLAB_{phase}_data.json")
        with open(anno, "rb") as f:
            self.meta: List[dict] = json.load(f)
        if num_our > 150000 and phase == "train":
            anno2 = os.path.join(self.path, "annotations", f"{phase}2",
                                 f"CISLAB_{phase}2_data.json")
            if os.path.isfile(anno2):
                with open(anno2, "rb") as f:
                    self.meta = self.meta + json.load(f)
        self._length = min(num_our, len(self.meta)) if phase == "train" \
            else len(self.meta)

    def __len__(self):
        return self._length

    def __getitem__(self, idx: int) -> Sample:
        rec = self.meta[idx]
        image = _resize(_imread_rgb(rec["file_name"]), self.image_size)
        # stored joints are in 224-px space; scale to 256 (dataset.py:132)
        joints = np.asarray(rec["joint_2d"], np.float32) * (
            self.image_size / 224.0
        )
        return Sample(
            image=image,
            joints=joints,
            aug_enabled=idx < len(self.meta) * self.ratio_of_aug,
        )


class LightHandValSet(LightHandDataset):
    """val_set: same storage, jitter off (dataset.py:215-231)."""

    def __init__(self, dataset_root: str, phase: str = "eval",
                 image_size: int = 256):
        super().__init__(dataset_root, phase, num_our=10**9,
                         ratio_of_aug=0.0, image_size=image_size)
