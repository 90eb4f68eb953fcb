"""Camera / geometric transforms (jnp, differentiable where the reference's
torch versions were).

Reference: src/utils/transforms.py:11-59 (cam2pixel/pixel2cam/world2cam) and
src/utils/geometric_layers.py:10-94 (rodrigues/quat2mat/orthographic
projection/camera calibration).
"""

from __future__ import annotations

import jax.numpy as jnp


def cam2pixel(cam_coord: jnp.ndarray, f, c) -> jnp.ndarray:
    """[N,3] camera coords -> [N,3] (u, v, z). f=(fx,fy), c=(cx,cy)."""
    cam_coord = jnp.asarray(cam_coord, jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    x = cam_coord[:, 0] / (cam_coord[:, 2] + 1e-8) * f[0] + c[0]
    y = cam_coord[:, 1] / (cam_coord[:, 2] + 1e-8) * f[1] + c[1]
    return jnp.stack([x, y, cam_coord[:, 2]], axis=1)


def pixel2cam(pixel_coord: jnp.ndarray, f, c) -> jnp.ndarray:
    pixel_coord = jnp.asarray(pixel_coord, jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    x = (pixel_coord[:, 0] - c[0]) / f[0] * pixel_coord[:, 2]
    y = (pixel_coord[:, 1] - c[1]) / f[1] * pixel_coord[:, 2]
    return jnp.stack([x, y, pixel_coord[:, 2]], axis=1)


def world2cam(world_coord: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[3,N] world -> camera: R @ (p - t). Matches transforms.py:25-27."""
    world_coord = jnp.asarray(world_coord, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    return r @ (world_coord - t.reshape(3, 1))


def rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [B,3] -> rotation matrices [B,3,3] via quaternions
    (differentiable; geometric_layers.py:10-27)."""
    theta = jnp.asarray(theta, jnp.float32)
    l1norm = jnp.linalg.norm(theta + 1e-8, axis=1)
    angle = l1norm[:, None]
    normalized = theta / angle
    half = angle * 0.5
    v_cos = jnp.cos(half)
    v_sin = jnp.sin(half)
    quat = jnp.concatenate([v_cos, v_sin * normalized], axis=1)
    return quat2mat(quat)


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """[B,4] (w,x,y,z) -> [B,3,3] (geometric_layers.py:29-46)."""
    quat = jnp.asarray(quat, jnp.float32)
    norm = jnp.linalg.norm(quat, axis=1, keepdims=True)
    q = quat / jnp.maximum(norm, 1e-8)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    b = quat.shape[0]
    w2, x2, y2, z2 = w**2, x**2, y**2, z**2
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    mat = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    )
    return mat.reshape(b, 3, 3)


def orthographic_projection(x: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """[B,N,3] points + [B,3] (s, tx, ty) -> [B,N,2]
    (geometric_layers.py:48-60)."""
    camera = camera.reshape(-1, 1, 3)
    x_trans = x[:, :, :2] + camera[:, :, 1:]
    return camera[:, :, 0:1] * x_trans


def euler_to_rotation(angles_deg: jnp.ndarray) -> jnp.ndarray:
    """XYZ Euler angles (degrees) -> rotation matrix [3,3]."""
    rad = jnp.deg2rad(jnp.asarray(angles_deg, jnp.float32))
    cx, cy, cz = jnp.cos(rad[0]), jnp.cos(rad[1]), jnp.cos(rad[2])
    sx, sy, sz = jnp.sin(rad[0]), jnp.sin(rad[1]), jnp.sin(rad[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def camera_calibration(points: jnp.ndarray, euler_deg, translation, focal,
                       principal, out_size: float = 224.0) -> jnp.ndarray:
    """Full extrinsic+intrinsic projection of [N,3] world points to pixels
    in an out_size^2 image (geometric_layers.py:62-94 semantics: Euler->R,
    p_cam = R (p - t), perspective divide, * focal + principal)."""
    r = euler_to_rotation(euler_deg)
    p = jnp.asarray(points, jnp.float32)
    t = jnp.asarray(translation, jnp.float32)
    cam = (r @ (p - t).T).T
    xy = cam[:, :2] / jnp.maximum(cam[:, 2:3], 1e-8)
    focal = jnp.asarray(focal, jnp.float32)
    principal = jnp.asarray(principal, jnp.float32)
    return xy * focal + principal
