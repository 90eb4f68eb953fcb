"""InterHand2.6M source (right-hand single-hand subset).

Reference: ``Dataset_interhand`` (src/utils/dataset_loader.py:57-234):
COCO-format annotations; world -> camera -> pixel projection
(ops/geometry.py math on host numpy here, since it runs once at load);
right-hand-only filter; bbox-padded ~square 224-context crop; joint reorder
(20,3,2,1,0,7,...) to wrist-first layout; joints scaled to the output size.
"""

from __future__ import annotations

import json
import os
import os.path as op

import numpy as np

from lighthand_tpu.data.records import Sample, Source
from lighthand_tpu.data.lighthand import _imread_rgb, _resize

INTERHAND_TO_OURS = (20, 3, 2, 1, 0, 7, 6, 5, 4, 11, 10, 9, 8, 15, 14, 13,
                     12, 19, 18, 17, 16)


def process_bbox(bbox, img_shape, expand: float = 1.25):
    """Aspect-preserving bbox expansion (reference preprocessing.py:183-210,
    simplified: expand around center, clip to the image)."""
    x, y, w, h = bbox
    cx, cy = x + w / 2, y + h / 2
    side = max(w, h) * expand
    x0 = max(cx - side / 2, 0)
    y0 = max(cy - side / 2, 0)
    x1 = min(cx + side / 2, img_shape[1])
    y1 = min(cy + side / 2, img_shape[0])
    return np.array([x0, y0, x1 - x0, y1 - y0], np.float32)


class InterHandDataset(Source):
    def __init__(self, dataset_root: str, mode: str = "train",
                 image_size: int = 256):
        self.image_size = image_size
        root = op.join(dataset_root, "InterHand2.6M_5fps_batch1")
        self.img_path = op.join(root, "images")
        annot = op.join(root, "annotations", mode)
        self.mode = mode

        with open(op.join(annot, f"InterHand2.6M_{mode}_data.json")) as f:
            db = json.load(f)
        with open(op.join(annot, f"InterHand2.6M_{mode}_camera.json")) as f:
            cameras = json.load(f)
        with open(op.join(annot, f"InterHand2.6M_{mode}_joint_3d.json")) as f:
            joints3d = json.load(f)

        images = {im["id"]: im for im in db["images"]}
        self.datalist = []
        for ann in db["annotations"]:
            if ann.get("hand_type") != "right":
                continue
            img = images[ann["image_id"]]
            cap, cam, frame = (str(img["capture"]), str(img["camera"]),
                               str(img["frame_idx"]))
            campos = np.asarray(cameras[cap]["campos"][cam], np.float32)
            camrot = np.asarray(cameras[cap]["camrot"][cam], np.float32)
            focal = np.asarray(cameras[cap]["focal"][cam], np.float32)
            princpt = np.asarray(cameras[cap]["princpt"][cam], np.float32)
            world = np.asarray(joints3d[cap][frame]["world_coord"],
                               np.float32)
            cam_xyz = (camrot @ (world - campos[None]).T).T
            px = cam_xyz[:, :2] / np.maximum(cam_xyz[:, 2:3], 1e-6) \
                * focal[None] + princpt[None]
            bbox = process_bbox(np.asarray(ann["bbox"], np.float32),
                                (img["height"], img["width"]))
            self.datalist.append({
                "img_file": op.join(self.img_path, mode, img["file_name"]),
                "joint_px": px,
                "bbox": bbox,
            })

    def __len__(self):
        return len(self.datalist)

    def __getitem__(self, idx: int) -> Sample:
        rec = self.datalist[idx]
        img = _imread_rgb(rec["img_file"])
        x, y, w, h = [int(v) for v in rec["bbox"]]
        x, y = max(x, 0), max(y, 0)
        crop = img[y:y + max(h, 1), x:x + max(w, 1)]
        joints = rec["joint_px"].copy()
        joints[:, 0] = (joints[:, 0] - x) / max(crop.shape[1], 1)
        joints[:, 1] = (joints[:, 1] - y) / max(crop.shape[0], 1)
        joints = joints[list(INTERHAND_TO_OURS), :2] * self.image_size
        return Sample(image=_resize(crop, self.image_size),
                      joints=joints.astype(np.float32))
