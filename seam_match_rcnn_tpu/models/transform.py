"""Image batching transform: GeneralizedRCNNTransform, TPU-style.

Reference semantics: torchvision ``GeneralizedRCNNTransform`` as
instantiated by MaskRCNN with min 800 / max 1333 — the reference imports
it wholesale (/root/reference/models/matchrcnn.py:2-3,475; resize+
normalize+batch happen inside ``model(images)``, see SURVEY.md L1 note).
It resizes each image so min side -> 800 (capped so max side <= 1333) and
pads the batch to a divisible-by-32 rectangle; shapes are dynamic per
batch.  XLA wants static shapes, so images are placed into one of two
fixed canvases — landscape (800, 1344) or portrait (1344, 800) — selected
by orientation.  The per-image valid size rides along and every
downstream stage (RPN clipping, postprocess) masks against it, which
reproduces torchvision's per-image ``image_sizes`` semantics exactly.

Canvas padding is filled with ``cfg.image_mean`` (raw space) so the
in-graph normalize maps it to EXACTLY 0 — torchvision normalizes first
and zero-pads after, so its padding is 0 in normalized space; zero-filled
raw padding would normalize to ~-2 and shift features within conv
receptive fields of every right/bottom border.

Resize uses cv2 INTER_LINEAR == torch's bilinear(align_corners=False,
antialias off), matching ``GeneralizedRCNNTransform.resize``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from ..config import TransformConfig


@dataclasses.dataclass
class ImageBatch:
    """Host-prepared batch for one canvas bucket."""

    pixels: np.ndarray      # [B, H, W, 3] float32 in [0, 1]
    sizes: np.ndarray       # [B, 2] int32 valid (h, w) in the canvas
    orig_sizes: np.ndarray  # [B, 2] int32 original (h, w)
    indices: List[int]      # positions in the caller's image list


def resize_scale(h: int, w: int, cfg: TransformConfig) -> float:
    scale = cfg.min_size / min(h, w)
    if scale * max(h, w) > cfg.max_size:
        scale = cfg.max_size / max(h, w)
    return scale


def resize_image(img: np.ndarray, cfg: TransformConfig) -> np.ndarray:
    h, w = img.shape[:2]
    scale = resize_scale(h, w, cfg)
    # torch F.interpolate(scale_factor=s, recompute_scale_factor=True)
    new_h, new_w = int(h * scale), int(w * scale)
    if (new_h, new_w) == (h, w):
        return img.astype(np.float32)
    return cv2.resize(img.astype(np.float32), (new_w, new_h), interpolation=cv2.INTER_LINEAR)


def batch_images(
    images: Sequence[np.ndarray], cfg: TransformConfig
) -> List[ImageBatch]:
    """Resize + bucket images into canvas batches.

    images: HWC float arrays in [0, 1] (RGB).  Returns one ImageBatch per
    populated orientation bucket.
    """
    buckets = {}
    for i, img in enumerate(images):
        r = resize_image(img, cfg)
        h, w = r.shape[:2]
        canvas = cfg.landscape_canvas if w >= h else cfg.portrait_canvas
        buckets.setdefault(canvas, []).append((i, r))

    out = []
    for canvas, items in buckets.items():
        b = len(items)
        # mean-filled padding == 0 after normalize (see module docstring)
        pixels = np.empty((b, canvas[0], canvas[1], 3), dtype=np.float32)
        pixels[:] = np.asarray(cfg.image_mean, np.float32)
        sizes = np.zeros((b, 2), dtype=np.int32)
        orig = np.zeros((b, 2), dtype=np.int32)
        idxs = []
        for j, (i, r) in enumerate(items):
            h, w = r.shape[:2]
            pixels[j, :h, :w] = r
            sizes[j] = (h, w)
            orig[j] = images[i].shape[:2]
            idxs.append(i)
        out.append(ImageBatch(pixels=pixels, sizes=sizes, orig_sizes=orig, indices=idxs))
    return out


def normalize(pixels: jnp.ndarray, cfg: TransformConfig) -> jnp.ndarray:
    """In-graph ImageNet normalization (fused into the first conv by XLA)."""
    mean = jnp.asarray(cfg.image_mean, dtype=pixels.dtype)
    std = jnp.asarray(cfg.image_std, dtype=pixels.dtype)
    return (pixels - mean) / std


def resize_boxes_back(
    boxes: np.ndarray, from_hw: Tuple[int, int], to_hw: Tuple[int, int]
) -> np.ndarray:
    """torchvision ``resize_boxes``: map canvas-space boxes to original
    image coordinates with independent per-axis ratios (GeneralizedRCNN
    postprocess — the reference's eval consumes original-space boxes)."""
    ry = to_hw[0] / from_hw[0]
    rx = to_hw[1] / from_hw[1]
    return boxes * np.asarray([rx, ry, rx, ry], dtype=boxes.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _device_ingest(frames: jnp.ndarray, cfg: TransformConfig) -> jnp.ndarray:
    """Jitted resize + canvas placement for a batch of SAME-SIZE frames —
    the TPU-feedable ingest path (north star): host threads only decode;
    bilinear resize (half-pixel, matching torchvision interpolate
    align_corners=False == cv2.INTER_LINEAR) and normalization run fused on
    device.  frames: [B, H, W, 3] uint8 or float in [0, 1]; one program per
    source geometry (video resolutions are few and constant per clip).
    Returns canvas pixels [B, Hc, Wc, 3] f32."""
    b, h, w = frames.shape[:3]
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    else:
        frames = frames.astype(jnp.float32)
    scale = resize_scale(h, w, cfg)
    new_h, new_w = int(h * scale), int(w * scale)
    if (new_h, new_w) != (h, w):
        frames = jax.image.resize(
            frames, (b, new_h, new_w, 3), method="linear", antialias=False
        )
    canvas = cfg.landscape_canvas if new_w >= new_h else cfg.portrait_canvas
    # mean-filled padding == 0 after normalize (see module docstring)
    full = jnp.broadcast_to(
        jnp.asarray(cfg.image_mean, jnp.float32),
        (b, canvas[0], canvas[1], 3),
    )
    return jax.lax.dynamic_update_slice(full, frames, (0, 0, 0, 0))


def device_batch_images(
    images: Sequence[np.ndarray], cfg: TransformConfig
) -> List[ImageBatch]:
    """batch_images with the resize on device: groups frames by identical
    source geometry, uploads each group raw (uint8 = 12x fewer host->device
    bytes than the resized f32 canvas) and resizes/pads on the TPU.  Output
    contract identical to batch_images; pixels are device arrays."""
    groups: dict = {}
    for i, img in enumerate(images):
        groups.setdefault(img.shape[:2], []).append(i)

    out = []
    for (h, w), idxs in groups.items():
        raw = np.stack([images[i] for i in idxs])
        scale = resize_scale(h, w, cfg)
        nh, nw = int(h * scale), int(w * scale)
        pixels = _device_ingest(jnp.asarray(raw), cfg)
        b = len(idxs)
        out.append(ImageBatch(
            pixels=pixels,
            sizes=np.tile(np.asarray([[nh, nw]], np.int32), (b, 1)),
            orig_sizes=np.tile(np.asarray([[h, w]], np.int32), (b, 1)),
            indices=list(idxs),
        ))
    return out
