"""FreiHAND dataset from TSV shards (the format the reference ships in).

Reference: ``HandMeshTSVDataset``/``HandMeshTSVYamlDataset``
(src/datasets/frei_dataloader.py:49-448). A yaml descriptor points at img /
label / hw TSVs (+ optional linelist); labels carry MANO-era annotations
(center/scale, 2d/3d joints, pose/betas). Augmentation (is_train):

- per-channel pixel noise in [0.6, 1.4]           (frei_dataloader.py:118)
- rotation N(0, 90) clipped to +-180, zeroed w.p. 0.6   (:121-129)
- scale N(1, 0.25) clipped to [0.75, 1.25]               (:126-127)
- flip disabled (always 0)                                (:107)

The crop uses the center/scale affine of ops/affine.py (200*scale reference
box) at 224 px, then a resize to 256; 2D keypoints go through the same
affine, normalized to [-1, 1], and are mapped back to pixels as
(kp*100 + 112) * 256/224 (:335). The reference returned BGR-swapped tensors
(:338) — a train/eval-consistent quirk we do NOT reproduce, since with
per-channel-symmetric noise and a from-scratch model, channel order is
learned; we keep RGB end to end.

TPU-first split: the host does decode + affine crop (geometry is
data-dependent), the device does noise/normalize/heatmaps.
"""

from __future__ import annotations

import json
import os.path as op
from typing import Optional

import numpy as np

from lighthand_tpu.data.records import Sample, Source
from lighthand_tpu.data.tsv import (
    CompositeTSVFile,
    TSVFile,
    find_file_path_in_yaml,
    img_from_base64,
    load_from_yaml_file,
)
from lighthand_tpu.ops.affine import crop_transform_matrix, get_transform

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class FreiHandTSVDataset(Source):
    def __init__(self, yaml_file: str, *, is_train: bool = True,
                 image_size: int = 256, seed: int = 9001):
        cfg = load_from_yaml_file(yaml_file)
        self.is_composite = cfg.get("composite", False)
        root = op.dirname(yaml_file)
        self.root = root
        if not self.is_composite:
            img_file = find_file_path_in_yaml(cfg["img"], root)
            label_file = find_file_path_in_yaml(cfg.get("label"), root)
            hw_file = find_file_path_in_yaml(cfg.get("hw"), root)
            linelist_file = find_file_path_in_yaml(cfg.get("linelist"), root)
            self.img_tsv = TSVFile(img_file)
            self.label_tsv = TSVFile(label_file) if label_file else None
            self.hw_tsv = TSVFile(hw_file) if hw_file else None
            self.line_list = None
            if linelist_file:
                with open(linelist_file) as f:
                    self.line_list = [int(x) for x in f if x.strip()]
        else:
            linelist_file = find_file_path_in_yaml(cfg.get("linelist"), root)
            self.img_tsv = CompositeTSVFile(cfg["img"], linelist_file,
                                            root=root)
            self.label_tsv = CompositeTSVFile(cfg["label"], linelist_file,
                                              root=root) if cfg.get("label") \
                else None
            self.hw_tsv = CompositeTSVFile(cfg["hw"], linelist_file,
                                           root=root)
            self.line_list = list(range(self.hw_tsv.num_rows()))

        self.is_train = is_train
        self.image_size = image_size
        self.crop_res = 224  # img_res (frei_dataloader.py:75)
        self.scale_factor = 0.25
        self.noise_factor = 0.4
        self.rot_factor = 90.0
        self.seed = seed

    def _line_no(self, idx: int) -> int:
        return idx if self.line_list is None else self.line_list[idx]

    def __len__(self) -> int:
        if self.line_list is not None:
            return len(self.line_list)
        return self.img_tsv.num_rows()

    def _augm_params(self, rng: np.random.Generator):
        """(rot_deg, scale) per frei_dataloader.py:105-132; flip always 0,
        per-channel noise is applied on device."""
        if not self.is_train:
            return 0.0, 1.0
        rot = float(np.clip(rng.standard_normal() * self.rot_factor,
                            -2 * self.rot_factor, 2 * self.rot_factor))
        sc = float(np.clip(rng.standard_normal() * self.scale_factor + 1.0,
                           1 - self.scale_factor, 1 + self.scale_factor))
        if rng.uniform() <= 0.6:
            rot = 0.0
        return rot, sc

    def getitems(self, indices) -> list:
        """Batch fetch: bulk-read all image + label rows through the native
        TSV engine (one lh_read_rows call per TSV instead of a Python
        seek/readline pair per row), then process per item."""
        if self.is_composite or not isinstance(self.img_tsv, TSVFile):
            return [self[int(i)] for i in indices]
        line_nos = [self._line_no(int(i)) for i in indices]
        img_rows = self.img_tsv.read_rows(line_nos)
        label_rows = (self.label_tsv.read_rows(line_nos)
                      if self.label_tsv else [None] * len(line_nos))
        return [self._process(int(i), ir, lr)
                for i, ir, lr in zip(indices, img_rows, label_rows)]

    def __getitem__(self, idx: int) -> Sample:
        line_no = self._line_no(idx)
        return self._process(idx, self.img_tsv[line_no],
                             self.label_tsv[line_no]
                             if self.label_tsv else None)

    def _process(self, idx: int, img_row, label_row) -> Sample:
        img_bgr = img_from_base64(img_row[-1])
        img = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)

        anno = json.loads(label_row[1])[0]
        center = np.asarray(anno["center"], np.float64)
        scale = float(anno["scale"])
        joints_2d = np.asarray(anno["2d_joints"], np.float32)
        if joints_2d.ndim == 3:
            joints_2d = joints_2d[0]

        rng = np.random.default_rng(self.seed * 2_000_003 + idx)
        rot, sc = self._augm_params(rng)

        # Crop: one inverse affine warp instead of pad/rotate/unpad/resize.
        res = (self.crop_res, self.crop_res)
        mat = crop_transform_matrix(center, sc * scale, res, rot=rot)
        # mat is OUTPUT->INPUT (crop_transform_matrix inverts get_transform
        # for inverse warps); cv2.warpAffine expects a FORWARD matrix unless
        # WARP_INVERSE_MAP is set. Without the flag cv2 re-inverts it,
        # warping the image by the OPPOSITE rotation / reciprocal scale of
        # what the keypoints get — every rot-augmented sample then carries
        # garbage labels (regression: test_frei_rot_aug_image_joint_consistency).
        crop = cv2.warpAffine(
            img, mat[:2].astype(np.float64), res,
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP, borderValue=0,
        )
        if self.image_size != self.crop_res:
            crop = cv2.resize(crop, (self.image_size, self.image_size),
                              interpolation=cv2.INTER_LINEAR)

        # 2D keypoints through the same transform (frei_dataloader.py:149-161):
        # kp -> crop px (1-based/int-truncated like the reference) ->
        # normalized [-1,1] -> (kp*100+112)*(size/224) pixels (:335).
        t = get_transform(center, sc * scale, res, rot=rot)
        homo = np.concatenate(
            [joints_2d[:, :2] + 1.0 - 1.0,  # reference adds 1 then subs 1
             np.ones((joints_2d.shape[0], 1), np.float32)], axis=1)
        px = (homo @ t.T)[:, :2].astype(int) + 1
        kp_norm = 2.0 * px.astype(np.float32) / self.crop_res - 1.0
        joint_2d = (kp_norm * 100.0 + 112.0) * (self.image_size / 224.0)

        # frei augmentation is per-channel pixel noise (applied on device,
        # ops/color.py:channel_pixel_noise) — NOT ColorJitter; the reference
        # never jitters frei samples (frei_dataloader.py:118,142-144).
        return Sample(image=crop.astype(np.uint8),
                      joints=joint_2d.astype(np.float32),
                      aug_enabled=False,
                      noise_enabled=self.is_train)
