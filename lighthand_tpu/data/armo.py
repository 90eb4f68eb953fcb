"""Armo real wrist-camera eval set with occlusion categories.

Reference: ``eval_set`` (src/tools/dataset.py:233-300). Records with fewer
than 21 coordinates or visibility flags are dropped at load; each item
carries a pose category in {Standard, Occlusion_by_Pinky,
Occlusion_by_Thumb, Occlusion_by_Both}. Joints are stored normalized and
scaled to the image size at read time (dataset.py:290-293).
"""

from __future__ import annotations

import json
import os

import numpy as np

from lighthand_tpu.data.records import Sample, Source
from lighthand_tpu.data.lighthand import _imread_rgb, _resize

POSE_CATEGORIES = (
    "Standard",
    "Occlusion_by_Pinky",
    "Occlusion_by_Thumb",
    "Occlusion_by_Both",
)


class ArmoEvalSet(Source):
    def __init__(self, dataset_root: str, phase: str = "eval",
                 image_size: int = 256):
        self.image_path = os.path.join(dataset_root, "Armo_hand_dataset",
                                       "rgb")
        anno_path = os.path.join(dataset_root, "Armo_hand_dataset",
                                 "annotations.json")
        with open(anno_path, "r") as f:
            data = json.load(f)
        # drop incomplete records (dataset.py:242-250)
        self.records = {
            k: v
            for k, v in data.items()
            if len(v["coordinates"]) >= 21 and len(v["visible"]) >= 21
        }
        self.keys = list(self.records)
        self.phase = phase
        self.image_size = image_size
        # train/val phases rasterize max-combine targets (dataset.py:296-298)
        if phase != "eval":
            self.heatmap_style = "max"

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, idx: int) -> Sample:
        key = self.keys[idx]
        rec = self.records[key]
        joints = np.asarray(rec["coordinates"], np.float32)[:, :2]
        visible = np.asarray(rec["visible"], np.float32).reshape(21, 1)
        joints = joints * self.image_size  # stored normalized (dataset.py:290)
        image = _resize(
            _imread_rgb(os.path.join(self.image_path,
                                     f"{rec['image_id']}.jpg")),
            self.image_size,
        )
        if self.phase == "eval":
            joints_v = np.concatenate([joints, visible], axis=1)
            return Sample(image=image, joints=joints_v,
                          meta={"pose_ctgy": rec["pose_ctgy"], "idx": key})
        # train/val phase builds max-combine heatmap targets
        # (reference dataset.py:296-298 via GenerateHeatmap)
        return Sample(image=image, joints=joints, hm_max=True)
