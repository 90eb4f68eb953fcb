"""make_lighthand generator: build a tiny fake ArmHand capture tree and run
the full post-processing (projection + roll/lift aug + JSON output)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lighthand_tpu.cli.make_lighthand import (
    in_frame,
    lift_for_rotation,
    process_split,
    project_to_camera,
    rotate_joints,
)


@pytest.fixture
def fake_armhand(tmp_path, rng):
    root = tmp_path / "ArmHand"
    phase = "train"
    anno = root / "annotations" / phase
    os.makedirs(anno)
    img_dir = root / "images" / phase / "Capture0" / "cam1"
    os.makedirs(img_dir)

    n = 8
    images, joints3d = [], {}
    # camera at -400mm on z, looking at origin, focal 500
    camera = {"0": {"focal": {"1": [500.0, 500.0]},
                    "campos": {"1": [0.0, 0.0, -400.0]},
                    "camrot": {"1": np.eye(3).tolist()}}}
    for i in range(n):
        fname = f"Capture0/cam1/{i:05d}.jpg"
        images.append({"camera": "1", "frame_idx": i, "file_name": fname})
        # a compact joint cloud near the camera axis -> lands mid-frame
        pts = rng.uniform(-25, 25, size=(21, 3))
        pts[:, 2] = 0.0
        joints3d[str(i)] = {"world_coord": pts.tolist()}
        img = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / phase / "Capture0" /
                        "cam1" / f"{i:05d}.jpg"), img)

    (anno / f"CISLAB_{phase}_camera.json").write_text(json.dumps(camera))
    (anno / f"CISLAB_{phase}_joint_3d.json").write_text(
        json.dumps({"0": joints3d}))
    (anno / f"CISLAB_{phase}_data.json").write_text(
        json.dumps({"images": images}))
    return str(root), str(tmp_path / "LightHand"), phase


def test_projection_math():
    world = np.array([[0.0, 0.0, 0.0], [40.0, -40.0, 0.0]])
    px = project_to_camera(world, np.eye(3), np.array([0.0, 0.0, -400.0]),
                           500.0, 112.0)
    np.testing.assert_allclose(px[0], [112.0, 112.0])
    np.testing.assert_allclose(px[1], [162.0, 62.0])


def test_lift_compensation_sign():
    import math

    # positive roll lifts one wrist corner above y=0 -> positive shift
    assert lift_for_rotation(math.radians(15), 112.0) > 0
    assert lift_for_rotation(0.0, 112.0) >= 0


def test_rotate_joints_identity():
    joints = np.array([[100.0, 100.0], [50.0, 150.0]])
    out = rotate_joints(joints, 0.0, 112.0, dy=5.0)
    np.testing.assert_allclose(out[:, 0], joints[:, 0])
    np.testing.assert_allclose(out[:, 1], joints[:, 1] + 5.0)


def test_process_split_end_to_end(fake_armhand):
    root, out_root, phase = fake_armhand
    n = process_split(root, out_root, phase, input_size=224, seed=7)
    assert n > 0
    store = os.path.join(out_root, "annotations", phase,
                         f"CISLAB_{phase}_data.json")
    with open(store) as f:
        recs = json.load(f)
    assert len(recs) == n
    for rec in recs:
        assert os.path.isfile(rec["file_name"])
        joints = np.asarray(rec["joint_2d"])
        assert joints.shape == (21, 2)
        assert in_frame(joints)  # generator guarantees in-frame joints
