"""Depth / ego-motion geometry utilities (JAX, pure functions).

Capability spec: reference model/modeling/monodepth_loss.py — disp_to_depth
(:103-112), depth_to_disp (:115-122), transformation_from_parameters /
rot_from_axisangle / get_translation_matrix (:151-227), BackprojectDepth
(:230-261), Project3D (:264-290), compute_smooth_loss (:293-308), SSIM
(:311-343), compute_depth_errors (:346+). These are load-bearing at
inference: the demo and the depth evaluators consume them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def disp_to_depth(disp, min_depth: float = 0.1, max_depth: float = 100.0):
    """Sigmoid disparity -> (scaled_disp, depth)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def depth_to_disp(depth, min_depth: float = 0.1, max_depth: float = 100.0):
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return (1.0 / depth - min_disp) / (max_disp - min_disp)


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (B, 1, 3) -> rotation as 4x4 (B, 4, 4) (Rodrigues)."""
    angle = jnp.linalg.norm(vec, axis=2, keepdims=True)  # (B,1,1)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[:, 0, 0]
    sa = jnp.sin(angle)[:, 0, 0]
    C = 1 - ca
    x, y, z = axis[:, 0, 0], axis[:, 0, 1], axis[:, 0, 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    B = vec.shape[0]
    rot = jnp.zeros((B, 4, 4), vec.dtype)
    rot = rot.at[:, 0, 0].set(x * xC + ca)
    rot = rot.at[:, 0, 1].set(xyC - zs)
    rot = rot.at[:, 0, 2].set(zxC + ys)
    rot = rot.at[:, 1, 0].set(xyC + zs)
    rot = rot.at[:, 1, 1].set(y * yC + ca)
    rot = rot.at[:, 1, 2].set(yzC - xs)
    rot = rot.at[:, 2, 0].set(zxC - ys)
    rot = rot.at[:, 2, 1].set(yzC + xs)
    rot = rot.at[:, 2, 2].set(z * zC + ca)
    rot = rot.at[:, 3, 3].set(1.0)
    return rot


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, 3) or (B, 3) translation -> (B, 4, 4)."""
    t = t.reshape(-1, 3)
    B = t.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (B, 4, 4))
    return T.at[:, :3, 3].set(t)


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(axisangle (B,1,3), translation (B,1,3)) -> SE(3) (B,4,4)."""
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    return R @ T if invert else T @ R


def pix_coords_homogeneous(height: int, width: int, batch: int) -> jnp.ndarray:
    """(B, 3, H*W) homogeneous pixel coordinates [x; y; 1]."""
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones((height * width,), jnp.float32)
    pc = jnp.stack([gx.reshape(-1), gy.reshape(-1), ones], axis=0)
    return jnp.broadcast_to(pc[None], (batch, 3, height * width))


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray, height: int, width: int):
    """depth (B, H, W) or (B,H,W,1), inv_K (B,4,4) -> cam points (B, 4, H*W)."""
    B = depth.shape[0]
    pix = pix_coords_homogeneous(height, width, B)
    cam = inv_K[:, :3, :3] @ pix
    cam = depth.reshape(B, 1, -1) * cam
    ones = jnp.ones((B, 1, height * width), cam.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points: jnp.ndarray, K: jnp.ndarray, T: Optional[jnp.ndarray], height: int, width: int, eps: float = 1e-7):
    """points (B,4,HW), K (B,4,4), T (B,4,4)|None -> (pix_coords (B,H,W,2) in
    [-1,1], ego_motion (B,3,HW))."""
    cam3d = T @ points if T is not None else points
    cam = K[:, :3, :] @ cam3d
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    B = points.shape[0]
    pix = pix.reshape(B, 2, height, width).transpose(0, 2, 3, 1)
    pix = pix / jnp.asarray([width - 1, height - 1], pix.dtype)
    pix = (pix - 0.5) * 2.0
    ego = cam3d[:, :3] - points[:, :3]
    return pix, ego


def compute_smooth_loss(inp: jnp.ndarray, img: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Edge-aware smoothness on NHWC tensors."""
    gx = jnp.abs(inp[:, :, :-1, :] - inp[:, :, 1:, :])
    gy = jnp.abs(inp[:, :-1, :, :] - inp[:, 1:, :, :])
    if img is not None:
        igx = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True)
        igy = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True)
        gx = gx * jnp.exp(-igx)
        gy = gy * jnp.exp(-igy)
    return gx.mean() + gy.mean()


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """SSIM loss map between NHWC images (reference SSIM :311-343):
    3x3 avg-pool stats over reflection-padded inputs."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2

    def pool(z):
        z = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    mu_x, mu_y = pool(x), pool(y)
    sig_x = pool(x * x) - mu_x ** 2
    sig_y = pool(y * y) - mu_y ** 2
    sig_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sig_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sig_x + sig_y + C2)
    return jnp.clip((1 - n / d) / 2, 0, 1)


def compute_depth_errors(gt: jnp.ndarray, pred: jnp.ndarray):
    """The 7 standard metrics (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3)."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    rmse = jnp.sqrt(((gt - pred) ** 2).mean())
    rmse_log = jnp.sqrt(((jnp.log(gt) - jnp.log(pred)) ** 2).mean())
    abs_rel = (jnp.abs(gt - pred) / gt).mean()
    sq_rel = (((gt - pred) ** 2) / gt).mean()
    return dict(abs_rel=abs_rel, sq_rel=sq_rel, rmse=rmse, rmse_log=rmse_log, a1=a1, a2=a2, a3=a3)
