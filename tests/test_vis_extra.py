"""Extra-visualization parity: software mesh renderer (opendr
equivalent, reference renderer.py:512-690), InterHand skeleton
renderers (vis.py:20-124), and MediaPipe-style landmark drawing
(drewing_utils.py:41-319)."""

import numpy as np
import pytest

from lighthand_tpu.utils.landmarks import (
    HAND_CONNECTIONS,
    DrawingSpec,
    draw_axis,
    draw_landmarks,
    normalized_to_pixel_coordinates,
    plot_landmarks,
)
from lighthand_tpu.utils.mesh_render import (
    Renderer,
    lambertian_point_light,
    project_points,
    rasterize_mesh,
    rotate_y,
    vertex_normals,
)
from lighthand_tpu.utils.vis3d import (
    draw_text,
    get_keypoint_rgb,
    hand_skeleton_21,
    vis_3d_keypoints,
    vis_keypoints,
)

# ---------------------------------------------------------------- mesh


def _square(z, size=1.0):
    """Two CCW-toward-camera triangles spanning [-size, size]^2 at depth z."""
    v = np.array(
        [[-size, -size, z], [size, -size, z], [size, size, z],
         [-size, size, z]]
    )
    f = np.array([[0, 2, 1], [0, 3, 2]])
    return v, f


def test_project_points_pinhole():
    xy, z = project_points(
        np.array([[1.0, -2.0, 5.0]]), rt=np.zeros(3), t=np.zeros(3),
        f=np.array([100.0, 100.0]), c=np.array([32.0, 32.0]))
    np.testing.assert_allclose(xy[0], [1 / 5 * 100 + 32, -2 / 5 * 100 + 32])
    assert z[0] == 5.0


def test_rotate_y_quarter_turn():
    out = rotate_y(np.array([[1.0, 0.0, 0.0]]), np.pi / 2)
    # row-vector @ ry convention of the reference (renderer.py:21-26)
    np.testing.assert_allclose(out[0], [0.0, 0.0, 1.0], atol=1e-12)


def test_vertex_normals_planar():
    v, f = _square(5.0)
    n = vertex_normals(v, f)
    # winding chosen to face the camera at the origin (-z)
    np.testing.assert_allclose(n, np.tile([0.0, 0.0, -1.0], (4, 1)),
                               atol=1e-12)


def test_lambertian_facing_and_backfacing():
    v, f = _square(5.0)
    head_on = lambertian_point_light(
        v, f, light_pos=np.array([0.0, 0.0, -1000.0]),
        albedo=np.array([1.0, 0.5, 0.25]),
        light_color=np.array([1.0, 1.0, 1.0]))
    # light almost exactly along the normal: full albedo comes through
    np.testing.assert_allclose(head_on, np.tile([1.0, 0.5, 0.25], (4, 1)),
                               atol=0.01)
    behind = lambertian_point_light(
        v, f, light_pos=np.array([0.0, 0.0, 1000.0]),
        albedo=np.ones(3), light_color=np.ones(3))
    np.testing.assert_allclose(behind, 0.0)


def test_rasterize_zbuffer_near_face_wins():
    # red square at z=5 occluded in its center by a green one at z=3
    vr, fr = _square(5.0, size=1.0)
    vg, fg = _square(3.0, size=0.3)
    verts = np.concatenate([vr, vg])
    faces = np.concatenate([fr, fg + 4])
    colors = np.array([[1.0, 0, 0]] * 4 + [[0, 1.0, 0]] * 4)
    px, z = project_points(verts, np.zeros(3), np.zeros(3),
                           np.array([40.0, 40.0]), np.array([32.0, 32.0]))
    img = rasterize_mesh(px, z, faces, colors,
                         background=np.zeros((64, 64, 3)), near=1.0)
    # red spans 32±(1/5*40)=32±8 px; green spans 32±(0.3/3*40)=32±4 px
    np.testing.assert_allclose(img[32, 32], [0, 1.0, 0])  # near face wins
    np.testing.assert_allclose(img[32, 26], [1.0, 0, 0])  # red apron
    np.testing.assert_allclose(img[32, 50], 0.0)  # outside both
    np.testing.assert_allclose(img[1, 1], 0.0)  # background


def test_renderer_render_over_background():
    v, f = _square(5.0)
    img = np.zeros((64, 64, 3))
    out = Renderer(faces=f).render(
        v, img=img, use_bg=True, focal_length=40.0,
        camera_t=np.zeros(3), camera_rot=np.zeros(3))
    assert out.shape == (64, 64, 3)
    assert out[32, 32].sum() > 0.05  # lit mesh over the zero background
    np.testing.assert_allclose(out[1, 1], 0.0)  # background preserved
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_renderer_vertex_color_route():
    v, f = _square(5.0)
    out = Renderer().render_vertex_color(
        v, faces=f, img=np.zeros((48, 48, 3)), use_bg=True,
        focal_length=30.0, vertex_color=np.array([1.0, 0.0, 0.0]))
    center = out[24, 24]
    assert center[0] > 0.05 and center[1] == 0.0 and center[2] == 0.0


# ------------------------------------------------------------ skeleton


def test_hand_skeleton_topology_matches_parents():
    sk = hand_skeleton_21()
    assert len(sk) == 21
    parents = [j["parent_id"] for j in sk]
    assert parents == [-1, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13,
                       14, 15, 0, 17, 18, 19]


def test_keypoint_rgb_reference_table():
    sk = hand_skeleton_21() + [
        {"name": "r_thumb_null", "parent_id": 4},
        {"name": "l_index_null", "parent_id": 8},
    ]
    rgb = get_keypoint_rgb(sk)
    # exact rows of the reference suffix table (vis.py:25-67)
    assert rgb["thumb0"] == (255, 204, 204)
    assert rgb["thumb3"] == (255, 51, 51)
    assert rgb["index1"] == (153, 255, 153)
    assert rgb["middle2"] == (255, 178, 102)
    assert rgb["ring3"] == (51, 153, 255)
    assert rgb["pinky1"] == (255, 153, 255)
    assert rgb["wrist"] == (230, 230, 0)
    assert rgb["r_thumb_null"] == (255, 0, 0)
    assert rgb["l_index_null"] == (0, 255, 0)


def test_vis_keypoints_score_gating():
    sk = hand_skeleton_21()
    rng = np.random.default_rng(0)
    kps = rng.uniform(10, 54, size=(21, 2))
    kps[4] = [60.0, 4.0]  # isolate the gated joint in a clean corner
    score = np.ones(21)
    score[4] = 0.0  # below score_thr=0.4: joint 4 must not be drawn
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    out = vis_keypoints(img, kps, score, sk)
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0  # something was drawn
    assert img.sum() == 0  # input untouched
    y, x = int(kps[4, 1]), int(kps[4, 0])
    assert out[y - 3:y + 4, x - 3:x + 4].sum() == 0  # gated joint blank


def test_vis_keypoints_accepts_chw():
    sk = hand_skeleton_21()
    kps = np.full((21, 2), 32.0)
    out = vis_keypoints(np.zeros((3, 64, 64)), kps, np.ones(21), sk)
    assert out.shape == (64, 64, 3)


def test_vis_3d_keypoints_headless(tmp_path):
    import matplotlib.pyplot as plt

    sk = hand_skeleton_21()
    kps = np.random.default_rng(1).normal(size=(21, 3))
    path = str(tmp_path / "kp3d.png")
    fig = vis_3d_keypoints(kps, np.ones(21), sk, filename=path)
    assert (tmp_path / "kp3d.png").stat().st_size > 0
    plt.close(fig)


def test_draw_text_rows():
    img = np.zeros((64, 96, 3))
    out = draw_text(img, {"pck": 0.876543, "name": "x"})
    assert out.min() >= 0.0
    # zero pixels were whitened to a margin, then green text drawn on it
    assert (out == 1.0).any() and (out[..., 1] > out[..., 0]).any()


# ----------------------------------------------------------- landmarks


def test_normalized_to_pixel_coordinates_bounds():
    assert normalized_to_pixel_coordinates(0.5, 0.5, 64, 64) == (32, 32)
    assert normalized_to_pixel_coordinates(1.0, 1.0, 64, 64) == (63, 63)
    assert normalized_to_pixel_coordinates(0.0, 0.0, 64, 64) == (0, 0)
    assert normalized_to_pixel_coordinates(-0.1, 0.5, 64, 64) is None
    assert normalized_to_pixel_coordinates(0.5, 1.1, 64, 64) is None


def test_draw_landmarks_gating_and_connections():
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    lms = np.array([
        [0.25, 0.25, 0.0, 1.0],
        [0.75, 0.75, 0.0, 1.0],
        [0.50, 0.50, 0.0, 0.1],   # below visibility threshold
        [1.50, 0.50, 0.0, 1.0],   # outside [0,1]
    ])
    drawn = draw_landmarks(img, lms, connections=[(0, 1), (1, 2), (2, 3)])
    assert set(drawn) == {0, 1}
    assert drawn[0] == (16, 16) and drawn[1] == (48, 48)
    assert img.sum() > 0
    # the (0,1) connection line passes through the middle
    assert img[32, 32].sum() > 0


def test_draw_landmarks_invalid_connection_raises():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        draw_landmarks(img, np.array([[0.5, 0.5]]), connections=[(0, 7)])
    with pytest.raises(ValueError):
        draw_landmarks(np.zeros((8, 8, 1), dtype=np.uint8),
                       np.array([[0.5, 0.5]]))


def test_hand_connections_cover_all_bones():
    assert len(HAND_CONNECTIONS) == 20
    children = {c for _, c in HAND_CONNECTIONS}
    assert children == set(range(1, 21))


def test_draw_axis_draws():
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    draw_axis(img, np.eye(3), np.array([0.0, 0.0, -1.0]),
              axis_drawing_spec=DrawingSpec(thickness=1))
    assert img.sum() > 0


def test_plot_landmarks_headless():
    import matplotlib.pyplot as plt

    lms = np.random.default_rng(2).uniform(0.2, 0.8, size=(21, 4))
    fig = plot_landmarks(lms, connections=HAND_CONNECTIONS)
    assert fig is not None
    plt.close(fig)
