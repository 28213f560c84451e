"""Self-supervised depth / ego-motion / object-motion training loss.

Behavioral spec: reference model/modeling/monodepth_loss.py
(MonodepthLoss.generate_images_pred :427-512, compute_losses :703-839,
GroundPlane RANSAC :13-101): 7 weighted terms over 4 scales —
  p_photo        (1.0)   min-reprojection photometric (0.85 SSIM + 0.15 L1)
                         with identity automasking + noise tie-break
  d_smooth       (1e-3)  edge-aware mean-normalized disparity smoothness
  d_ground       (0.1)   penalize disparity below the RANSAC ground plane
  c_smooth       (1e-3)  edge-aware complete-3D-flow smoothness
  c_consistency  (5.0)   |residual flow| outside the motion mask
  m_sparsity     (0.04)  BCE(motion_prob, 0) on quasi-static pixels
  m_smooth       (0.1)   edge-aware motion-mask smoothness
with a linear ramp on the last four (clip(3*step/35000, 0, 1)).

TPU-native: everything fixed-shape and jit-able — the per-image numpy
RANSAC sampling becomes a batched PRNG gather + vmapped 3x3 least-squares
over all candidate planes at once; masked selections become weighted means.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry import (
    backproject_depth,
    compute_smooth_loss,
    depth_to_disp,
    disp_to_depth,
    pix_coords_homogeneous,
    project_3d,
    ssim,
)
from ..ops import grid_sample, interpolate

COEFS = {
    "p_photo": 1.0,
    "d_smooth": 1e-3,
    "d_ground": 0.1,
    "c_smooth": 1e-3,
    "c_consistency": 5.0,
    "m_sparsity": 0.04,
    "m_smooth": 0.1,
}
RAMPED = ("c_smooth", "c_consistency", "m_sparsity", "m_smooth")


# ----------------------------------------------------------------- ground plane
def _plane_lstsq(pts: jnp.ndarray) -> jnp.ndarray:
    """pts: (..., n, 3) -> plane params (..., 3, 1) solving y = w1*x + w2*z + w3."""
    y = pts[..., 1:2]
    A = jnp.concatenate([pts[..., 0:1], pts[..., 2:3], jnp.ones_like(y)], axis=-1)
    At = jnp.swapaxes(A, -1, -2)
    return jnp.linalg.inv(At @ A + 1e-6) @ (At @ y)


def ransac_ground_plane(
    rng: jax.Array,
    points: jnp.ndarray,  # (B, HW_g, 3) candidate ground points
    all_points: jnp.ndarray,  # (B, HW, 3)
    num_points_per_it: int = 5,
    max_it: int = 100,
    tol: float = 0.005,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (dist2plane (B, HW), plane_param (B, 3, 1)); both grad-stopped."""
    B, N, _ = points.shape
    idx = jax.random.randint(rng, (B, max_it, num_points_per_it), 0, N)
    samples = jnp.take_along_axis(points[:, None], idx[..., None], axis=2)  # (B, it, n, 3)
    ws = _plane_lstsq(samples)  # (B, it, 3, 1)

    y = points[..., 1:2]
    A = jnp.concatenate([points[..., 0:1], points[..., 2:3], jnp.ones_like(y)], axis=-1)
    dist = A[:, None] @ ws - y[:, None]  # (B, it, N, 1)
    inlier_frac = (jnp.abs(dist[..., 0]) < tol).mean(-1)  # (B, it)
    best = jnp.argmax(inlier_frac, axis=1)
    best_w = jnp.take_along_axis(ws, best[:, None, None, None], axis=1)[:, 0]  # (B, 3, 1)

    ya = all_points[..., 1:2]
    Aa = jnp.concatenate([all_points[..., 0:1], all_points[..., 2:3], jnp.ones_like(ya)], axis=-1)
    dist_all = (Aa @ best_w - ya)[..., 0]  # (B, HW)
    return jax.lax.stop_gradient(dist_all), jax.lax.stop_gradient(best_w)


def _ground_term(rng, disp_s, inv_K, h, w):
    """d_ground for one scale: disparity below the estimated ground plane.
    Reference process_ground/get_ground_depth (:655-701,:682-701)."""
    B = disp_s.shape[0]
    _, depth = disp_to_depth(disp_s[..., 0])  # (B, h, w)
    cam = backproject_depth(depth, inv_K, h, w)[:, :3]  # (B, 3, h*w)
    pts = cam.transpose(0, 2, 1)  # (B, hw, 3)
    g_rows = int(0.4 * h)  # g_prior = 0.4
    ground_pts = pts.reshape(B, h, w, 3)[:, -g_rows:].reshape(B, -1, 3)
    _, w_best = ransac_ground_plane(rng, ground_pts, pts, 5, 100, 0.005)

    w_adj = w_best.at[:, 2].add(0.005)  # plane_param4diff: w3 += tol
    rays = inv_K[:, :3, :3] @ pix_coords_homogeneous(h, w, B)  # (B, 3, hw)
    vx, vy, vz = rays[:, 0], rays[:, 1], rays[:, 2]
    w1, w2, w3 = w_adj[:, 0], w_adj[:, 1], w_adj[:, 2]
    ground_depth = w3 / (vy - vx * w1 - vz * w2 + 1e-12)
    invalid = (ground_depth < 0) | (ground_depth > 100)
    ground_depth = jnp.where(invalid, 100.0, ground_depth)
    ground_disp = depth_to_disp(ground_depth).reshape(B, h, w)

    diff = disp_s[..., 0] - ground_disp
    diff = jnp.where(invalid.reshape(B, h, w), 0.0, diff)
    diff = jnp.minimum(diff, 0.0)  # only penalize below ground
    return -jnp.mean(diff)


def _reprojection_loss(pred, target):
    l1 = jnp.abs(target - pred).mean(-1, keepdims=True)
    s = ssim(pred, target).mean(-1, keepdims=True)
    return 0.85 * s + 0.15 * l1  # (B, H, W, 1)


def monodepth_loss(
    rng: jax.Array,
    outputs: Dict,
    targets: Dict,
    step: jnp.ndarray,
    frame_ids: Sequence[int] = (-1, 1),
    ramp_steps: int = 35000,
    mask_disp_threshold: float = 0.03,
) -> Dict[str, jnp.ndarray]:
    """
    outputs:
      disps:          {scale: (B, h_s, w_s, 1)} sigmoid disparity (scale 0 = full res)
      cam_T_cam:      {frame_id: (B, 4, 4)}
      complete_flow:  {(frame_id, scale): (B, h_s, w_s, 3)}
      motion_mask:    {(frame_id, scale): (B, h_s, w_s, 1)} sigmoid
      motion_prob:    {(frame_id, scale): (B, h_s, w_s, 1)} logits*0.005
    targets:
      color:          {frame_id (incl. 0): (B, H, W, 3)} photometric frames
      K, inv_K:       (B, 4, 4)
    """
    color0 = targets["color"][0]
    B, H, W, _ = color0.shape
    K, inv_K = targets["K"], targets["inv_K"]
    # scale count follows the decoder's emitted disparity pyramid (the
    # reference trains with num_scales=4; ModelConfig.num_depth_scales lets
    # the multichip dryrun's micro config run the identical loss structure
    # over fewer scales)
    S = len(outputs["disps"])
    F = len(frame_ids)

    ramp = jnp.clip(3.0 * step / ramp_steps, 0.0, 1.0)
    coefs = {k: (v * ramp if k in RAMPED else v) for k, v in COEFS.items()}

    # RNG consumption order matches the original per-scale formulation
    r_noise, r_ground = [], []
    for _ in range(S):
        rng, rn, rg = jax.random.split(rng, 3)
        r_noise.append(rn)
        r_ground.append(rg)

    # ---------------------------------------------------------------- warping
    # The photometric pipeline runs at full (H, W) resolution for every
    # (frame, scale) pair, so the F*S instances are batched into one leading
    # axis: one backprojection, one projection, one grid_sample, one SSIM of
    # batch F*S*B instead of F*S separate graphs. (TPU-first: fewer, larger
    # kernels; also ~8x fewer HLO ops than the per-pair loop.)
    disp_full = jnp.stack(
        [
            interpolate(outputs["disps"][s], size=(H, W), mode="bilinear", align_corners=False)
            for s in range(S)
        ]
    )  # (S, B, H, W, 1)
    _, depth = disp_to_depth(disp_full[..., 0].reshape(S * B, H, W))
    K_s = jnp.tile(K, (S, 1, 1))
    inv_K_s = jnp.tile(inv_K, (S, 1, 1))
    cam_points = backproject_depth(depth, inv_K_s, H, W)  # (SB, 4, HW)

    cam_f = jnp.tile(cam_points, (F, 1, 1))  # (FSB, 4, HW) ordered (F, S, B)
    K_f = jnp.tile(K_s, (F, 1, 1))
    T_f = jnp.concatenate(
        [jnp.tile(outputs["cam_T_cam"][f], (S, 1, 1)) for f in frame_ids], axis=0
    )
    sample_ego, ego_flow = project_3d(cam_f, K_f, T_f, H, W)  # (FSB,H,W,2), (FSB,3,HW)

    def _up_full(key, ch):
        # outputs[key][(f, s)]: (B, h_s, w_s, ch) -> (F, S, B, H, W, ch)
        return jnp.stack(
            [
                interpolate(
                    jnp.concatenate([outputs[key][(f, s)] for f in frame_ids], axis=0),
                    size=(H, W), mode="bilinear", align_corners=False,
                ).reshape(F, B, H, W, ch)
                for s in range(S)
            ],
            axis=1,
        )

    cflow_full = _up_full("complete_flow", 3).reshape(F * S * B, H, W, 3)
    mask_full = _up_full("motion_mask", 1).reshape(F * S * B, H, W, 1)

    cflow_flat = cflow_full.reshape(-1, H * W, 3).transpose(0, 2, 1)  # (FSB, 3, HW)
    residual = cflow_flat - ego_flow
    independ = residual * mask_full.reshape(-1, 1, H * W)

    # detached complete-flow sample (reference :479-483)
    cp_tmp = jax.lax.stop_gradient(cam_f).at[:, :3].add(cflow_flat)
    sample_complete = jax.lax.stop_gradient(project_3d(cp_tmp, K_f, None, H, W)[0])
    sample_ego_d = jax.lax.stop_gradient(sample_ego)

    cam_points2 = cam_f.at[:, :3].add(independ)
    sample, _ = project_3d(cam_points2, K_f, T_f, H, W)

    src_stack = jnp.concatenate([targets["color"][f] for f in frame_ids], axis=0)  # (FB,...)
    src_f = jnp.concatenate(
        [jnp.tile(targets["color"][f], (S, 1, 1, 1)) for f in frame_ids], axis=0
    )  # (FSB, H, W, 3)
    color0_fs = jnp.tile(color0, (F * S, 1, 1, 1))

    warped = grid_sample(src_f, sample, align_corners=True, padding_mode="border")
    reproj = _reprojection_loss(warped, color0_fs)[..., 0].reshape(F, S, B, H, W)
    identity = _reprojection_loss(src_stack, jnp.tile(color0, (F, 1, 1, 1)))[..., 0]
    identity = identity.reshape(F, 1, B, H, W)

    # per-scale identity noise, drawn exactly as the original (B, H, W, F)
    noise = jnp.stack(
        [jax.random.normal(r_noise[s], (B, H, W, F)) for s in range(S)], axis=0
    ).transpose(4, 0, 1, 2, 3) * 1e-5  # (S,B,H,W,F) -> (F, S, B, H, W)
    combined = jnp.concatenate([identity + noise, reproj], axis=0)  # (2F, S, B, H, W)
    p_photo_s = combined.min(axis=0).mean(axis=(1, 2, 3))  # (S,)

    residual_img = residual.transpose(0, 2, 1).reshape(F, S, B, H, W, 3)
    sample_ego_fs = sample_ego_d.reshape(F, S, B, H, W, 2)
    sample_complete_fs = sample_complete.reshape(F, S, B, H, W, 2)

    # ------------------------------------------------- per-scale regularizers
    losses = {k: 0.0 for k in COEFS}
    total = 0.0
    for scale in range(S):
        disp_s = outputs["disps"][scale]
        h, w = disp_s.shape[1:3]
        color_s = interpolate(color0, size=(h, w), mode="bilinear", align_corners=False)
        color_sf = jnp.tile(color_s, (F, 1, 1, 1))

        losses_ps = {k: 0.0 for k in COEFS}
        losses_ps["p_photo"] = p_photo_s[scale]

        # --- disparity regularization
        norm_disp = disp_s / (disp_s.mean(axis=(1, 2), keepdims=True) + 1e-7)
        losses_ps["d_smooth"] = compute_smooth_loss(norm_disp, color_s) / (2 ** scale)
        losses_ps["d_ground"] = _ground_term(r_ground[scale], disp_s, inv_K, h, w) / (2 ** scale)

        # --- motion regularization, frames stacked along batch; equal-size
        # stacked means equal the original (1/nf) * sum_f of per-frame means
        mask_s = jnp.concatenate([outputs["motion_mask"][(f, scale)] for f in frame_ids], axis=0)
        prob_s = jnp.concatenate([outputs["motion_prob"][(f, scale)] for f in frame_ids], axis=0)
        cflow_s = jnp.concatenate([outputs["complete_flow"][(f, scale)] for f in frame_ids], axis=0)
        residual_s = interpolate(
            residual_img[:, scale].reshape(F * B, H, W, 3), size=(h, w),
            mode="bilinear", align_corners=False,
        )

        losses_ps["c_smooth"] = compute_smooth_loss(cflow_s, color_sf) / (2 ** scale)

        valid_disp = jax.lax.stop_gradient(jnp.tile(disp_s, (F, 1, 1, 1)) > mask_disp_threshold)
        losses_ps["c_consistency"] = jnp.mean(
            valid_disp * (1 - jax.lax.stop_gradient(mask_s)) * jnp.abs(residual_s)
        ) / (2 ** scale)

        se = interpolate(
            sample_ego_fs[:, scale].reshape(F * B, H, W, 2), size=(h, w),
            mode="bilinear", align_corners=False,
        )
        sc = interpolate(
            sample_complete_fs[:, scale].reshape(F * B, H, W, 2), size=(h, w),
            mode="bilinear", align_corners=False,
        )
        disp_mag = jnp.sum((se - sc) ** 2, axis=-1).reshape(F, B, h, w)
        static = disp_mag < disp_mag.mean(axis=(1, 2, 3), keepdims=True)  # per-frame mean
        n_static = static.sum(axis=(1, 2, 3))  # (F,)
        # BCEWithLogits(prob, 0) == softplus(prob); masked mean over static px
        bce = (jax.nn.softplus(prob_s[..., 0]).reshape(F, B, h, w) * static).sum(
            axis=(1, 2, 3)
        ) / jnp.maximum(n_static, 1)
        all_have_static = jnp.all(static.sum(axis=(2, 3)) > 0, axis=1)  # (F,)
        losses_ps["m_sparsity"] = jnp.where(all_have_static, 3.0 * bce, 0.0).mean() / (2 ** scale)

        losses_ps["m_smooth"] = compute_smooth_loss(mask_s, color_sf) / (2 ** scale)

        scale_total = 0.0
        for k in COEFS:
            scale_total = scale_total + losses_ps[k] * coefs[k]
            losses[k] = losses[k] + losses_ps[k]
        total = total + scale_total / S  # reference divides by num_scales

    out = {f"monodepth/{k}": v for k, v in losses.items()}
    out["loss_monodepth"] = total
    return out
