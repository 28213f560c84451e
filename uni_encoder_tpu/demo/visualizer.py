"""Lightweight visualization (demo output rendering).

Capability spec: reference demo/visualizer.py + demo/colormap.py (a 1.4k-line
detectron2 visualizer fork). This compact equivalent renders the same demo
artifacts: semantic overlays from the class palette, panoptic segments
(stuff + instance-shaded things with boundaries and class-name labels),
instance overlays with class-name + score text labels and boxes,
magma-colormapped disparity, and HSV flow images.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.cityscapes_labels import CLASS_NAMES, PALETTE


def _palette() -> np.ndarray:
    return np.asarray(PALETTE, np.uint8)


def overlay(image: np.ndarray, color_map: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    return (image.astype(np.float32) * (1 - alpha) + color_map.astype(np.float32) * alpha).astype(
        np.uint8
    )


def draw_sem_seg(image: np.ndarray, sem_seg: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """sem_seg: (K, H, W) probabilities or (H, W) labels."""
    if sem_seg.ndim == 3:
        sem_seg = sem_seg.argmax(0)
    colors = _palette()[np.clip(sem_seg, 0, len(PALETTE) - 1)]
    return overlay(image, colors, alpha)


def _draw_text(image: np.ndarray, text: str, xy: Tuple[int, int]) -> np.ndarray:
    """Render `text` with its top-left at xy (PIL default font, white on a
    dark backing box — the reference visualizer's label style,
    demo/visualizer.py draw_text)."""
    from PIL import Image, ImageDraw

    pil = Image.fromarray(image)
    draw = ImageDraw.Draw(pil)
    x, y = int(xy[0]), int(xy[1])
    bbox = draw.textbbox((x, y), text)
    draw.rectangle(bbox, fill=(0, 0, 0))
    draw.text((x, y), text, fill=(255, 255, 255))
    return np.array(pil)  # writable copy


def _mask_label_anchor(mask: np.ndarray) -> Optional[Tuple[int, int]]:
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return None
    return int(np.median(xs)), int(np.median(ys))


def draw_panoptic(
    image: np.ndarray,
    panoptic_seg: np.ndarray,
    segments_info: List[Dict],
    alpha: float = 0.5,
    draw_labels: bool = True,
) -> np.ndarray:
    rng = np.random.RandomState(42)
    colors = np.zeros((*panoptic_seg.shape, 3), np.uint8)
    for seg in segments_info:
        base = np.asarray(PALETTE[seg["category_id"] % len(PALETTE)], np.float32)
        if seg["isthing"]:
            jitter = rng.uniform(-40, 40, 3)
            base = np.clip(base + jitter, 0, 255)
        colors[panoptic_seg == seg["id"]] = base.astype(np.uint8)
    out = overlay(image, colors, alpha)
    # thin boundaries between segments
    edges = np.zeros(panoptic_seg.shape, bool)
    edges[:-1] |= panoptic_seg[:-1] != panoptic_seg[1:]
    edges[:, :-1] |= panoptic_seg[:, :-1] != panoptic_seg[:, 1:]
    out[edges] = 255
    if draw_labels:
        for seg in segments_info:
            anchor = _mask_label_anchor(panoptic_seg == seg["id"])
            if anchor is None:
                continue
            name = CLASS_NAMES[seg["category_id"] % len(CLASS_NAMES)]
            out = _draw_text(out, name, anchor)
    return out


def draw_instances(
    image: np.ndarray,
    masks: np.ndarray,
    labels: np.ndarray,
    scores: np.ndarray,
    alpha: float = 0.5,
    score_threshold: float = 0.5,
    boxes: Optional[np.ndarray] = None,
    draw_labels: bool = True,
) -> np.ndarray:
    rng = np.random.RandomState(7)
    colors = np.zeros((*image.shape[:2], 3), np.uint8)
    order = np.argsort(scores)
    for i in order:
        if scores[i] < score_threshold:
            continue
        base = np.asarray(PALETTE[int(labels[i]) % len(PALETTE)], np.float32)
        base = np.clip(base + rng.uniform(-40, 40, 3), 0, 255)
        colors[np.asarray(masks[i], bool)] = base.astype(np.uint8)
    covered = colors.any(-1)
    out = image.copy()
    out[covered] = overlay(image, colors, alpha)[covered]
    for i in order[::-1]:
        if scores[i] < score_threshold:
            continue
        m = np.asarray(masks[i], bool)
        if boxes is not None:
            x0, y0, x1, y1 = [int(v) for v in boxes[i]]
            out[y0:y1 + 1, x0:x0 + 1] = 255
            out[y0:y1 + 1, x1:x1 + 1] = 255
            out[y0:y0 + 1, x0:x1 + 1] = 255
            out[y1:y1 + 1, x0:x1 + 1] = 255
        if draw_labels:
            anchor = _mask_label_anchor(m)
            if anchor is not None:
                name = CLASS_NAMES[int(labels[i]) % len(CLASS_NAMES)]
                out = _draw_text(out, f"{name} {float(scores[i]):.0%}", anchor)
    return out


def colorize_disparity(disp: np.ndarray, percentile: float = 95) -> np.ndarray:
    """Magma colormap normalized at the 95th percentile (demo/defaults.py)."""
    from matplotlib import cm

    disp = np.asarray(disp, np.float32)
    vmax = np.percentile(disp, percentile)
    disp = np.clip(disp / max(vmax, 1e-8), 0, 1)
    return (cm.magma(disp)[..., :3] * 255).astype(np.uint8)


def hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    """(H, W, 3) hsv in [0,1] -> rgb (matches the reference's torch impl
    monodepth_loss.py:125-148)."""
    import matplotlib.colors as mcolors

    return mcolors.hsv_to_rgb(hsv)


def flow_to_rgb(pix_motion: np.ndarray) -> np.ndarray:
    """2-D pixel motion (H, W, 2) -> inverted-HSV flow visualization
    (reference MonodepthLoss.vis_motion :622-653 / demo defaults vis_motion)."""
    dx, dy = pix_motion[..., 0], pix_motion[..., 1]
    mag = np.sqrt(dx ** 2 + dy ** 2)
    theta = np.arctan2(dy, dx + 1e-12)
    theta = (5 * np.pi / 2 - theta) % (2 * np.pi)
    hsv = np.ones((*mag.shape, 3), np.float32)
    hsv[..., 0] = ((theta - np.pi / 4) % (2 * np.pi)) / (2 * np.pi)
    hsv[..., 2] = mag / max(mag.max(), 1e-8)
    rgb = 1 - hsv_to_rgb(hsv)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
