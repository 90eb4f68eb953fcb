"""Software mesh renderer: z-buffered triangle rasterizer + point lights.

TPU-native replacement for the reference's vendored opendr renderer
(src/utils/renderer.py:512-690, `Renderer.render` /
`render_vertex_color`): pinhole `ProjectPoints` camera (Rodrigues
rotation + translation + focal/center), three Lambertian point lights
over a per-vertex albedo, and composition over a background image.
opendr is an abandoned C/OpenGL package that does not build on this
stack; visualization is host-side work in both frameworks (the device
keeps training while overlays are written), so the equivalent here is a
pure-NumPy perspective-correct rasterizer — no GL context, no compiled
dependency, and trivially portable to any host the TPU pod's workers
run on.

Everything operates on float arrays in [0, 1] like opendr's `.r`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = [
    "rotate_y",
    "rodrigues_np",
    "project_points",
    "vertex_normals",
    "lambertian_point_light",
    "rasterize_mesh",
    "Renderer",
]


def rotate_y(points: np.ndarray, angle: float) -> np.ndarray:
    """Rotate points about the Y axis (reference renderer.py:21-26)."""
    c, s = np.cos(angle), np.sin(angle)
    ry = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    return np.asarray(points, dtype=np.float64) @ ry


def rodrigues_np(rvec: np.ndarray) -> np.ndarray:
    """Axis-angle vector -> 3x3 rotation matrix (host-side twin of
    ops/geometry.py:rodrigues; opendr's ProjectPoints takes `rt` in this
    form)."""
    rvec = np.asarray(rvec, dtype=np.float64).reshape(3)
    theta = float(np.linalg.norm(rvec))
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    kx = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]],
        dtype=np.float64,
    )
    return np.eye(3) + np.sin(theta) * kx + (1.0 - np.cos(theta)) * (kx @ kx)


def project_points(
    verts: np.ndarray,
    rt: np.ndarray,
    t: np.ndarray,
    f: np.ndarray,
    c: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """opendr `ProjectPoints` (zero distortion): camera-frame transform then
    pinhole projection. Returns ((V,2) pixel xy, (V,) camera-space depth)."""
    r = rodrigues_np(rt)
    cam = np.asarray(verts, dtype=np.float64) @ r.T + np.asarray(
        t, dtype=np.float64
    )
    z = cam[:, 2]
    f = np.broadcast_to(np.asarray(f, dtype=np.float64), (2,))
    c = np.asarray(c, dtype=np.float64).reshape(2)
    xy = cam[:, :2] / np.where(np.abs(z) < 1e-9, 1e-9, z)[:, None] * f + c
    return xy, z


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (opendr `VertNormals` semantics:
    accumulate un-normalized face cross products, then normalize)."""
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )
    vn = np.zeros_like(verts)
    np.add.at(vn, faces[:, 0], fn)
    np.add.at(vn, faces[:, 1], fn)
    np.add.at(vn, faces[:, 2], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.where(norm < 1e-12, 1.0, norm)


def lambertian_point_light(
    verts: np.ndarray,
    faces: np.ndarray,
    light_pos: np.ndarray,
    albedo: np.ndarray,
    light_color: np.ndarray,
    normals: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-vertex diffuse term of one point light (opendr
    `LambertianPointLight`): albedo * light_color * max(n . dir_to_light, 0).
    The reference sums three of these over the same albedo
    (renderer.py:580-607)."""
    verts = np.asarray(verts, dtype=np.float64)
    if normals is None:
        normals = vertex_normals(verts, faces)
    d = np.asarray(light_pos, dtype=np.float64).reshape(1, 3) - verts
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    ndotl = np.maximum((normals * d).sum(axis=1), 0.0)[:, None]
    albedo = np.broadcast_to(
        np.asarray(albedo, dtype=np.float64), verts.shape
    )
    return albedo * np.asarray(light_color, dtype=np.float64) * ndotl


def rasterize_mesh(
    verts_px: np.ndarray,
    verts_z: np.ndarray,
    faces: np.ndarray,
    vert_colors: np.ndarray,
    background: np.ndarray,
    near: float = 1.0,
    far: float = float("inf"),
) -> np.ndarray:
    """Z-buffered, perspective-correct triangle rasterization.

    Per-face bounding-box loop with the per-pixel work vectorized — the
    host-side sweet spot for meshes of a few thousand faces (a MANO hand
    is ~1.5k). Colors are interpolated with perspective-correct
    barycentrics (attr/z and 1/z interpolated linearly in screen space).
    """
    h, w = background.shape[:2]
    color = np.asarray(background, dtype=np.float64).copy()
    zbuf = np.full((h, w), np.inf)
    verts_px = np.asarray(verts_px, dtype=np.float64)
    verts_z = np.asarray(verts_z, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    vert_colors = np.asarray(vert_colors, dtype=np.float64)

    for tri in faces:
        z = verts_z[tri]
        if np.any(z <= near) or np.all(z >= far):
            # conservative near-plane cull: drops the WHOLE triangle when
            # any vertex is at z <= near (GL would clip such triangles and
            # keep the visible part; the reference opendr renderer draws
            # them). Harmless for the hand use case, where camera_t z is
            # far from the near plane.
            continue
        p = verts_px[tri]
        x0 = max(int(np.floor(p[:, 0].min())), 0)
        x1 = min(int(np.ceil(p[:, 0].max())) + 1, w)
        y0 = max(int(np.floor(p[:, 1].min())), 0)
        y1 = min(int(np.ceil(p[:, 1].max())) + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        denom = (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1]) - (
            p[2, 0] - p[0, 0]
        ) * (p[1, 1] - p[0, 1])
        if abs(denom) < 1e-12:
            continue
        xs, ys = np.meshgrid(
            np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5
        )
        w1 = (
            (xs - p[0, 0]) * (p[2, 1] - p[0, 1])
            - (p[2, 0] - p[0, 0]) * (ys - p[0, 1])
        ) / denom
        w2 = (
            (p[1, 0] - p[0, 0]) * (ys - p[0, 1])
            - (xs - p[0, 0]) * (p[1, 1] - p[0, 1])
        ) / denom
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        inv_z = w0 / z[0] + w1 / z[1] + w2 / z[2]
        pix_z = 1.0 / np.maximum(inv_z, 1e-12)
        patch_z = zbuf[y0:y1, x0:x1]
        win = inside & (pix_z < patch_z) & (pix_z < far)
        if not win.any():
            continue
        attr = (
            w0[..., None] * vert_colors[tri[0]] / z[0]
            + w1[..., None] * vert_colors[tri[1]] / z[1]
            + w2[..., None] * vert_colors[tri[2]] / z[2]
        ) * pix_z[..., None]
        patch_c = color[y0:y1, x0:x1]
        patch_c[win] = attr[win]
        patch_z[win] = pix_z[win]
    return np.clip(color, 0.0, 1.0)


class Renderer:
    """Drop-in equivalent of the reference `Renderer`
    (src/utils/renderer.py:512-607): same constructor surface, color
    table, default camera center, `far = |t_z - mean(v_z)| + 20`
    frustum, three-point lighting rig (positions/colors/120-degree yaw
    identical), and background composition (`use_bg` pastes the input
    image under the mesh; otherwise a constant `bg_color` fill)."""

    def __init__(self, width=800, height=600, near=0.5, far=1000,
                 faces=None):
        self.colors = {
            "hand": [0.9, 0.9, 0.9],
            "pink": [0.9, 0.7, 0.7],
            "light_blue": [0.65098039, 0.74117647, 0.85882353],
        }
        self.width = width
        self.height = height
        self.faces = faces

    def _shade(self, vertices, faces, albedo):
        yrot = np.radians(120)
        normals = vertex_normals(vertices, faces)
        vc = lambertian_point_light(
            vertices, faces, rotate_y(np.array([-200.0, -100.0, -100.0]), yrot),
            albedo, np.array([1.0, 1.0, 1.0]), normals)
        vc += lambertian_point_light(
            vertices, faces, rotate_y(np.array([800.0, 10.0, 300.0]), yrot),
            albedo, np.array([1.0, 1.0, 1.0]), normals)
        vc += lambertian_point_light(
            vertices, faces, rotate_y(np.array([-500.0, 500.0, 1000.0]), yrot),
            albedo, np.array([0.7, 0.7, 0.7]), normals)
        return vc

    def _render_common(self, vertices, faces, img, camera_t, camera_rot,
                       camera_center, use_bg, bg_color, albedo,
                       focal_length):
        if img is not None:
            height, width = img.shape[:2]
        else:
            height, width = self.height, self.width
        if faces is None:
            faces = self.faces
        faces = np.asarray(faces, dtype=np.int64)
        if camera_center is None:
            camera_center = np.array([width * 0.5, height * 0.5])

        verts_px, verts_z = project_points(
            vertices, camera_rot, camera_t,
            focal_length * np.ones(2), camera_center)
        dist = abs(float(np.asarray(camera_t).reshape(3)[2])
                   - float(np.mean(vertices, axis=0)[2]))
        far = dist + 20.0

        if img is not None:
            bg = (np.asarray(img, dtype=np.float64) if use_bg
                  else np.ones_like(np.asarray(img, dtype=np.float64))
                  * np.asarray(bg_color, dtype=np.float64))
        else:
            bg = np.ones((height, width, 3))

        vc = self._shade(np.asarray(vertices, dtype=np.float64), faces,
                         albedo)
        return rasterize_mesh(verts_px, verts_z, faces, vc, bg,
                              near=1.0, far=far)

    def render(self, vertices, faces=None, img=None,
               camera_t=np.zeros(3), camera_rot=np.zeros(3),
               camera_center=None, use_bg=False, bg_color=(0.0, 0.0, 0.0),
               body_color=None, focal_length=5000, **kwargs):
        color = self.colors["light_blue" if body_color is None
                            else body_color]
        return self._render_common(vertices, faces, img, camera_t,
                                   camera_rot, camera_center, use_bg,
                                   bg_color, np.asarray(color),
                                   focal_length)

    def render_vertex_color(self, vertices, faces=None, img=None,
                            camera_t=np.zeros(3), camera_rot=np.zeros(3),
                            camera_center=None, use_bg=False,
                            bg_color=(0.0, 0.0, 0.0), vertex_color=None,
                            focal_length=5000, **kwargs):
        if vertex_color is None:
            vertex_color = self.colors["light_blue"]
        return self._render_common(vertices, faces, img, camera_t,
                                   camera_rot, camera_center, use_bg,
                                   bg_color, np.asarray(vertex_color),
                                   focal_length)
