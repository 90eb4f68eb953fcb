"""LightHand / Armo / RHD dataset sources over generated data trees."""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def fake_lighthand(tmp_path, rng):
    root = tmp_path
    base = root / "LightHand"
    img_dir = base / "images" / "train"
    os.makedirs(img_dir)
    os.makedirs(base / "annotations" / "train")
    os.makedirs(base / "annotations" / "eval")

    def make_split(phase, n):
        recs = []
        for i in range(n):
            p = str(img_dir / f"{phase}_{i:04d}.jpg")
            cv2.imwrite(p, rng.integers(0, 255, size=(224, 224, 3),
                                        dtype=np.uint8))
            recs.append({"file_name": p,
                         "joint_2d": rng.uniform(10, 210,
                                                 size=(21, 2)).tolist()})
        path = base / "annotations" / phase / f"CISLAB_{phase}_data.json"
        path.write_text(json.dumps(recs))
        return recs

    make_split("train", 10)
    make_split("eval", 4)
    return str(root)


def test_lighthand_dataset(fake_lighthand, rng):
    from lighthand_tpu.data.lighthand import LightHandDataset, LightHandValSet

    ds = LightHandDataset(fake_lighthand, "train", num_our=8,
                          ratio_of_aug=0.5, image_size=256)
    assert len(ds) == 8  # clamped to num_our
    s = ds[0]
    assert s.image.shape == (256, 256, 3)
    assert s.joints.shape == (21, 2)
    # joints scaled x(256/224)
    assert s.joints.max() <= 210 * 256 / 224 + 1e-3
    # prefix-fraction jitter gate (dataset.py:134): idx < len(meta)*0.5
    assert ds[0].aug_enabled and not ds[9 - 2].aug_enabled

    val = LightHandValSet(fake_lighthand, "eval", image_size=256)
    assert len(val) == 4
    assert not val[0].aug_enabled


@pytest.fixture
def fake_armo(tmp_path, rng):
    root = tmp_path
    rgb = root / "Armo_hand_dataset" / "rgb"
    os.makedirs(rgb)
    annos = {}
    for i in range(5):
        cv2.imwrite(str(rgb / f"im{i}.jpg"),
                    rng.integers(0, 255, size=(256, 256, 3), dtype=np.uint8))
        annos[str(i)] = {
            "coordinates": rng.uniform(0.1, 0.9, size=(21, 2)).tolist(),
            "visible": [1.0] * 21,
            "pose_ctgy": ["Standard", "Occlusion_by_Pinky",
                          "Occlusion_by_Thumb", "Occlusion_by_Both",
                          "Standard"][i],
            "file_name": f"im{i}.jpg",
            "image_id": f"im{i}",
        }
    # one incomplete record that must be dropped (dataset.py:242-250)
    annos["bad"] = {"coordinates": [[0.5, 0.5]] * 10, "visible": [1] * 10,
                    "pose_ctgy": "Standard", "file_name": "x",
                    "image_id": "im0"}
    (root / "Armo_hand_dataset" / "annotations.json").write_text(
        json.dumps(annos))
    return str(root)


def test_armo_eval_set(fake_armo):
    from lighthand_tpu.data.armo import ArmoEvalSet

    ds = ArmoEvalSet(fake_armo, phase="eval", image_size=256)
    assert len(ds) == 5  # the incomplete record is dropped
    s = ds[0]
    assert s.image.shape == (256, 256, 3)
    assert s.joints.shape == (21, 3)  # xy + visibility
    assert s.meta["pose_ctgy"] == "Standard"
    # normalized coords scaled to pixels
    assert 0.1 * 256 - 1 <= s.joints[:, :2].min()
    assert s.joints[:, :2].max() <= 0.9 * 256 + 1


@pytest.fixture
def fake_rhd(tmp_path, rng):
    root = tmp_path
    base = root / "RHD_published_v2" / "evaluation"
    os.makedirs(base / "color")
    os.makedirs(base / "mask")
    anno = {}
    for i in range(3):
        cv2.imwrite(str(base / "color" / f"{i:05d}.png"),
                    rng.integers(0, 255, size=(320, 320, 3), dtype=np.uint8))
        # mask with a generous hand region (labels > 17)
        mask = np.zeros((320, 320), np.uint8)
        mask[100:200, 100:220] = 20
        cv2.imwrite(str(base / "mask" / f"{i:05d}.png"), mask)
        # 42 joints in 3D camera space; right-hand block is rows 21:
        xyz = np.concatenate([
            rng.uniform(-0.1, 0.1, size=(21, 3)) + [0, 0, 0.5],
            rng.uniform(-0.05, 0.05, size=(21, 3)) + [0, 0, 0.5],
        ])
        k = np.array([[320.0, 0, 160.0], [0, 320.0, 160.0], [0, 0, 1.0]])
        anno[i] = {"K": k, "xyz": xyz}
    with open(base / "anno_evaluation.pickle", "wb") as f:
        pickle.dump(anno, f)
    return str(root)


def test_rhd_dataset(fake_rhd):
    from lighthand_tpu.data.rhd import RHDDataset

    ds = RHDDataset(fake_rhd, "evaluation", image_size=256)
    assert len(ds) == 3
    s = ds[0]
    assert s.image.shape == (256, 256, 3)
    assert s.joints.shape == (21, 2)
    assert np.isfinite(s.joints).all()
    assert (s.joints >= -256).all() and (s.joints <= 512).all()


@pytest.fixture
def fake_gan(tmp_path, rng):
    root = tmp_path
    base = root / "GANeratedHands_Release" / "data" / "noObject" / "0001"
    os.makedirs(base)
    for i in range(1, 4):
        cv2.imwrite(str(base / f"{i:04d}_color.png"),
                    rng.integers(0, 255, size=(256, 256, 3), dtype=np.uint8))
        joints = rng.uniform(10, 240, size=(21, 2)).reshape(-1)
        (base / f"{i:04d}_joint2D.txt").write_text(
            ",".join(f"{v:.3f}" for v in joints) + ",")
    return str(root)


def test_gan_dataset(fake_gan):
    from lighthand_tpu.data.gan import GANeratedDataset

    ds = GANeratedDataset(fake_gan, image_size=256)
    assert len(ds) == 3
    s = ds[0]
    assert s.image.shape == (256, 256, 3)
    assert s.joints.shape == (21, 2)
    # reference truncates joint floats to int (dataset_loader.py:490)
    assert np.allclose(s.joints, np.trunc(s.joints))


@pytest.fixture
def fake_interhand(tmp_path, rng):
    root = tmp_path
    base = root / "InterHand2.6M_5fps_batch1"
    annot = base / "annotations" / "val"
    os.makedirs(annot)
    img_dir = base / "images" / "val"
    os.makedirs(img_dir)

    images, annotations = [], []
    cameras = {"0": {"campos": {"4": [0.0, 0.0, -500.0]},
                     "camrot": {"4": np.eye(3).tolist()},
                     "focal": {"4": [600.0, 600.0]},
                     "princpt": {"4": [160.0, 160.0]}}}
    joints3d = {"0": {}}
    for i in range(3):
        fn = f"img{i}.jpg"
        cv2.imwrite(str(img_dir / fn),
                    rng.integers(0, 255, size=(320, 320, 3), dtype=np.uint8))
        images.append({"id": i, "file_name": fn, "width": 320,
                       "height": 320, "capture": 0, "camera": "4",
                       "frame_idx": i, "seq_name": "s"})
        # Three bboxes covering _context_crop's branches: interior
        # (plain space padding), corner-clamped, and oversized
        # (negative space -> shrink to the 224 context).
        bboxes = [[100, 100, 120, 120], [0, 250, 60, 60], [10, 10, 300, 200]]
        annotations.append({"id": i, "image_id": i, "hand_type": "right",
                            "hand_type_valid": 1,
                            "joint_valid": [1] * 42,
                            "bbox": bboxes[i]})
        world = rng.uniform(-40, 40, size=(42, 3))
        world[:, 2] = 0.0
        joints3d["0"][str(i)] = {"world_coord": world.tolist()}

    (annot / "InterHand2.6M_val_data.json").write_text(
        json.dumps({"images": images, "annotations": annotations}))
    (annot / "InterHand2.6M_val_camera.json").write_text(json.dumps(cameras))
    (annot / "InterHand2.6M_val_joint_3d.json").write_text(
        json.dumps(joints3d))
    return str(root)


def test_interhand_dataset(fake_interhand):
    from lighthand_tpu.data.interhand import InterHandDataset

    ds = InterHandDataset(fake_interhand, "val", image_size=256)
    assert len(ds) == 3
    s = ds[0]
    assert s.image.shape == (256, 256, 3)
    assert s.joints.shape == (21, 2)
    assert np.isfinite(s.joints).all()


def test_interhand_crop_matches_reference_math(fake_interhand):
    """Joint coordinates match an independent transcription of the
    reference chain (preprocessing.py:125-142 process_bbox +
    dataset_loader.py:203-236 context crop / joint scale) bit-for-bit on
    all three _context_crop branches."""
    import json as _json

    from lighthand_tpu.data.interhand import InterHandDataset

    base = os.path.join(fake_interhand, "InterHand2.6M_5fps_batch1",
                        "annotations", "val")
    with open(os.path.join(base, "InterHand2.6M_val_data.json")) as f:
        db = _json.load(f)
    with open(os.path.join(base, "InterHand2.6M_val_joint_3d.json")) as f:
        j3d = _json.load(f)

    ds = InterHandDataset(fake_interhand, "val", image_size=256)
    order = (20, 3, 2, 1, 0, 7, 6, 5, 4, 11, 10, 9, 8, 15, 14, 13, 12,
             19, 18, 17, 16)
    for i, ann in enumerate(db["annotations"]):
        # Reference-transcribed oracle, written against the upstream source
        # (not this repo's implementation).  Camera: identity rot, campos
        # (0,0,-500), focal 600, princpt 160 (the fixture's values).
        world = np.asarray(j3d["0"][str(i)]["world_coord"], np.float32)
        cam = world - np.array([0.0, 0.0, -500.0], np.float32)
        px = cam[:, :2] / cam[:, 2:3] * 600.0 + 160.0
        x, y, w, h = [float(v) for v in ann["bbox"]]
        c_x, c_y = x + w / 2.0, y + h / 2.0
        if w > h:
            h = w
        elif w < h:
            w = h
        w, h = w * 1.25, h * 1.25
        bbox = np.array([c_x - w / 2.0, c_y - h / 2.0, w, h], np.float32)
        b = list(map(int, bbox))
        b[0], b[1] = max(b[0], 0), max(b[1], 0)
        sl, sr = int(224 - b[3]) / 2, int(224 - b[2]) / 2
        if b[1] - sl < 0:
            sl = b[1]
        if b[1] + b[3] + sl > 320:
            sl = 320 - (b[1] + b[3]) - 1
        if b[0] - sr < 0:
            sr = b[0]
        if b[0] + b[2] + sr > 320:
            sr = 320 - (b[0] + b[2]) - 1
        jx = (px[:, 0] - b[0] + sr) * (256.0 / (b[2] + 2 * sr))
        jy = (px[:, 1] - b[1] + sl) * (256.0 / (b[3] + 2 * sl))
        expect = np.stack([jx, jy], 1)[list(order)]
        got = ds[i].joints
        np.testing.assert_allclose(got, expect, rtol=0, atol=1e-3)
        crop_h = int(b[1] + b[3] + sl) - int(b[1] - sl)
        crop_w = int(b[0] + b[2] + sr) - int(b[0] - sr)
        assert crop_h > 0 and crop_w > 0
        assert ds[i].image.shape == (256, 256, 3)


def test_synth_freihand_tsv_tree(tmp_path):
    """The generated FreiHAND-format TSV tree (sharded + concatenated via
    concat_tsv_files) loads through FreiHandTSVDataset end to end."""
    from lighthand_tpu.cli.make_synth_data import write_freihand_tsv_tree
    from lighthand_tpu.data.freihand import FreiHandTSVDataset

    yaml_path = write_freihand_tsv_tree(str(tmp_path), n=5, seed=3,
                                        n_shards=2, log_every=0)
    ds = FreiHandTSVDataset(yaml_path, is_train=True, image_size=224)
    assert len(ds) == 5
    s = ds[0]
    assert s.image.shape == (224, 224, 3)
    assert s.joints.shape[0] == 21
    assert s.noise_enabled and not s.aug_enabled
    # eval mode: identity-ish crop keeps joints in-frame
    ds_eval = FreiHandTSVDataset(yaml_path, is_train=False, image_size=224)
    j = ds_eval[1].joints
    assert (j[:, :2] >= -20).all() and (j[:, :2] <= 244).all()


def test_frei_rot_aug_image_joint_consistency(tmp_path):
    """Rotation/scale-augmented frei samples keep image and keypoints in the
    SAME frame (regression: crop_transform_matrix is OUTPUT->INPUT, so the
    cv2.warpAffine call needs WARP_INVERSE_MAP; without it the image gets
    the opposite rotation / reciprocal scale of the joints and 40% of train
    labels are garbage). Checks the intensity centroid of the rendered hand
    against the centroid of the stored joints, decompressed from the
    reference's (kp_norm*100+112) target frame back to crop pixels."""
    from lighthand_tpu.cli.make_synth_data import write_freihand_tsv_tree
    from lighthand_tpu.data.freihand import FreiHandTSVDataset

    yaml_path = write_freihand_tsv_tree(str(tmp_path), n=10, seed=3,
                                        n_shards=1, log_every=0)
    ds = FreiHandTSVDataset(yaml_path, is_train=True, image_size=256)
    checked_rot = 0
    for idx in range(10):
        rng = np.random.default_rng(ds.seed * 2_000_003 + idx)
        rot, sc = ds._augm_params(rng)
        s = ds[idx]
        img = s.image.astype(np.float32).sum(axis=2)
        # hand pixels = bright foreground over the dark noise background;
        # threshold at the 98th percentile to isolate them
        mask = img > np.percentile(img, 98)
        assert mask.sum() > 50
        ys, xs = np.nonzero(mask)
        img_cen = np.array([xs.mean(), ys.mean()])
        # invert target compression: j = ((2p/224-1)*100+112)*(size/224)
        j = s.joints[:, :2] * (224.0 / 256.0)
        p = ((j - 112.0) / 100.0 + 1.0) * 112.0 * (256.0 / 224.0)
        joint_cen = p.mean(axis=0)
        err = np.linalg.norm(img_cen - joint_cen)
        assert err < 20.0, (idx, rot, sc, err)
        if rot != 0.0:
            checked_rot += 1
    assert checked_rot >= 2  # seeded draws must exercise the rotated path
