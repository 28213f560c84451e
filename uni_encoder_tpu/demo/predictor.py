"""Demo predictor: two-pass single-image multi-task inference + rendering.

Capability spec: reference demo/defaults.py (DefaultPredictor.__call__,
:68-160) and demo/predictor.py (VisualizationDemo.run_on_image :42-82):
  * pass 1 'sequence' at 192x512 with the previous frame -> disparity
    (magma colormap), motion mask, and ego / independent / total optical
    flow visualizations via backproject-project geometry (vis_motion);
  * pass 2 'segmentation' at the SEG test resolution -> semantic / instance
    / panoptic outputs rendered by the visualizer.

Improvement over the reference: one segmentation forward is shared across
all requested visualizations (the reference re-runs the model per task,
demo/predictor.py:59-76).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

from ..config import Config
from ..data.mappers import TestMapper, intrinsics_from_camera_json, resize_shortest_edge
from ..engine.predictor import Predictor
from ..geometry import (
    backproject_depth,
    disp_to_depth,
    pix_coords_homogeneous,
    project_3d,
)
from . import visualizer as vis


# default cityscapes intrinsics (the reference demo hard-codes a camera json
# path, demo/defaults.py:108; these are the standard cityscapes values)
DEFAULT_CAMERA = {
    "intrinsic": {"fx": 2262.52, "fy": 2265.30, "u0": 1096.98, "v0": 513.137},
    "extrinsic": {"baseline": 0.209313},
}


def _flow_map(depth, K, inv_K, motion=None, cam_T_cam=None):
    """2-D pixel motion from depth + optional 3D motion map + optional ego
    transform (reference vis_motion semantics)."""
    import jax.numpy as jnp

    h, w = depth.shape
    depth_j = jnp.asarray(depth)[None]
    K_j = jnp.asarray(K)[None]
    inv_K_j = jnp.asarray(inv_K)[None]

    xs = (np.arange(w) / w) * 2 - 1
    ys = (np.arange(h) / h) * 2 - 1
    ind_map = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2)

    cam = backproject_depth(depth_j, inv_K_j, h, w)
    pix_err, _ = project_3d(cam, K_j, None, h, w)
    err = np.asarray(pix_err[0]) - ind_map

    cam = backproject_depth(depth_j, inv_K_j, h, w)
    if motion is not None:
        cam = cam.at[:, :3].add(jnp.asarray(motion.reshape(1, 3, -1)))
    T = jnp.asarray(cam_T_cam)[None] if cam_T_cam is not None else None
    pix, _ = project_3d(cam, K_j, T, h, w)
    return np.asarray(pix[0]) - ind_map - err  # (h, w, 2)


class VisualizationDemo:
    def __init__(self, cfg: Config, variables, camera: Optional[Dict] = None):
        self.cfg = cfg
        self.predictor = Predictor(cfg, variables)
        thing_ids = list(range(11, 19))
        self.predictor.set_thing_ids(thing_ids)
        self.camera = camera or DEFAULT_CAMERA
        self.seq_hw = (192, 512)

    def run_on_image(
        self, image: np.ndarray, prev_image: Optional[np.ndarray], task: str
    ) -> Dict[str, np.ndarray]:
        """image/prev_image: RGB uint8 HWC full resolution. Returns a dict of
        rendered uint8 images keyed by output name."""
        from ..data.tokenizer import tokenize_task

        outputs: Dict[str, np.ndarray] = {}
        h, w = self.seq_hw

        # ---- pass 1: sequence (depth / motion / flow)
        if prev_image is not None:
            img_s = np.asarray(Image.fromarray(image).resize((w, h), Image.LANCZOS))
            prev_s = np.asarray(Image.fromarray(prev_image).resize((w, h), Image.LANCZOS))
            seq = self.predictor.infer_sequence({"image": img_s, "prev_image": prev_s})
            disp = seq["disp_results"]
            scaled_disp, depth = disp_to_depth(disp)
            outputs["depth"] = vis.colorize_disparity(np.asarray(scaled_disp))
            outputs["motion_mask"] = (np.clip(seq["motion_mask"], 0, 1) * 255).astype(np.uint8)

            K, inv_K = intrinsics_from_camera_json(self.camera, (h, w))
            depth = np.asarray(depth)
            flow_3d = seq["complete_flow"].transpose(2, 0, 1)  # (3, h, w)
            residual = flow_3d  # complete flow visualized as independent motion
            ego = _flow_map(depth, K, inv_K, motion=None, cam_T_cam=seq["cam_T_cam"])
            ind = _flow_map(depth, K, inv_K, motion=residual, cam_T_cam=None)
            tot = _flow_map(depth, K, inv_K, motion=residual, cam_T_cam=seq["cam_T_cam"])
            outputs["ego_flow"] = vis.flow_to_rgb(ego)
            outputs["independent_flow"] = vis.flow_to_rgb(ind)
            outputs["total_flow"] = vis.flow_to_rgb(tot)

        # ---- pass 2: segmentation (one forward shared across tasks)
        seg_img, _ = resize_shortest_edge(
            image, self.cfg.input.seg_min_size_test, self.cfg.input.seg_max_size_test
        )
        item = {
            "image": seg_img,
            "height": image.shape[0],
            "width": image.shape[1],
            "task_tokens": np.asarray(tokenize_task(f"The task is {task}"), np.int32),
        }
        seg = self.predictor.infer_segmentation(item)
        if task in ("semantic", "panoptic") and "sem_seg" in seg:
            outputs["semantic"] = vis.draw_sem_seg(image, seg["sem_seg"])
        if task == "panoptic" and "panoptic_seg" in seg:
            pan, infos = seg["panoptic_seg"]
            outputs["panoptic"] = vis.draw_panoptic(image, pan, infos)
        if task in ("instance", "panoptic") and "instances" in seg:
            inst = seg["instances"]
            outputs["instance"] = vis.draw_instances(
                image, inst["masks"], inst["labels"], inst["scores"],
                boxes=inst.get("boxes"),
            )
        return outputs
