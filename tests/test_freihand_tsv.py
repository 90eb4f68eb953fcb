"""End-to-end FreiHAND TSV path: build a tiny TSV shard set (images +
labels + hw + yaml descriptor) and read it back through FreiHandTSVDataset."""

import json

import numpy as np
import pytest
import yaml

from lighthand_tpu.data.freihand import FreiHandTSVDataset
from lighthand_tpu.data.tsv import img_to_base64, tsv_writer


@pytest.fixture
def tiny_freihand(tmp_path, rng):
    n = 6
    img_rows, label_rows, hw_rows = [], [], []
    for i in range(n):
        img = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        img_rows.append([f"img{i}", img_to_base64(img)])
        anno = {
            "center": [112.0, 112.0],
            "scale": 1.12,  # 200*scale = 224 box -> identity-ish crop
            "has_2d_joints": 1,
            "has_3d_joints": 1,
            "2d_joints": rng.uniform(40, 180, size=(21, 3)).tolist(),
            "3d_joints": rng.normal(size=(21, 4)).tolist(),
            "has_smpl": 0,
            "pose": np.zeros(72).tolist(),
            "betas": np.zeros(10).tolist(),
        }
        label_rows.append([f"img{i}", json.dumps([anno])])
        hw_rows.append([f"img{i}", json.dumps([{"height": 224,
                                                "width": 224}])])
    tsv_writer(img_rows, str(tmp_path / "train.img.tsv"))
    tsv_writer(label_rows, str(tmp_path / "train.label.tsv"))
    tsv_writer(hw_rows, str(tmp_path / "train.hw.tsv"))
    desc = {"img": "train.img.tsv", "label": "train.label.tsv",
            "hw": "train.hw.tsv"}
    ypath = tmp_path / "train.yaml"
    ypath.write_text(yaml.safe_dump(desc))
    return str(ypath)


def test_freihand_dataset_reads_shards(tiny_freihand):
    ds = FreiHandTSVDataset(tiny_freihand, is_train=False, image_size=256)
    assert len(ds) == 6
    s = ds[0]
    assert s.image.shape == (256, 256, 3)
    assert s.image.dtype == np.uint8
    assert s.joints.shape == (21, 2)
    assert np.isfinite(s.joints).all()


def test_freihand_train_aug_is_seeded(tiny_freihand):
    ds = FreiHandTSVDataset(tiny_freihand, is_train=True, image_size=256,
                            seed=123)
    a1 = ds[2]
    a2 = ds[2]
    np.testing.assert_array_equal(a1.image, a2.image)  # deterministic by idx
    ds2 = FreiHandTSVDataset(tiny_freihand, is_train=True, image_size=256,
                             seed=999)
    # different seed -> (almost surely) different augmentation
    assert not np.array_equal(ds2[2].image, a1.image)


def test_freihand_keypoint_mapping_identity_box(tiny_freihand):
    """With center=(112,112), scale=1.12 (224px box) and no aug, the kp
    chain reduces to (int(kp)+1 -> normalize -> *100+112 -> *256/224)."""
    ds = FreiHandTSVDataset(tiny_freihand, is_train=False, image_size=256)
    s = ds[1]
    # joints must land inside the 256px frame given 40..180 inputs
    assert (s.joints > 20).all() and (s.joints < 240).all()


def test_concat_tsv_files(tmp_path):
    """Concatenated shards + rebased lineidx read back identically
    (reference miscellaneous.py:100-133)."""
    from lighthand_tpu.data.tsv import TSVFile, concat_tsv_files

    rows_a = [["k0", "aaa"], ["k1", "bb"]]
    rows_b = [["k2", "c" * 40], ["k3", "dd"], ["k4", "e"]]
    pa, pb = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    tsv_writer(rows_a, pa)
    tsv_writer(rows_b, pb)
    out = str(tmp_path / "all.tsv")
    concat_tsv_files([pa, pb], out)

    t = TSVFile(out)
    assert len(t) == 5
    got = [t.seek(i) for i in range(5)]
    assert got == rows_a + rows_b
