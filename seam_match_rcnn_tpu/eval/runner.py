"""Batched inference runner: host-side bucketing/padding around the jitted
detector forward.

Replaces the reference's chunked no-grad loops (`inferstep`/`step` slicing at
/root/reference/stuffs/engine.py:113-115, evaluate_movingfashion.py:30-32):
images are resized into the two static canvases, padded to a fixed chunk
size (so exactly two programs compile per export configuration), run through
``MatchRCNN.inference``, and returned per-image with boxes mapped back to
original coordinates (torchvision GeneralizedRCNNTransform.postprocess).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.matchrcnn import MatchRCNN
from ..models.transform import (batch_images, device_batch_images,
                                resize_boxes_back)
from ..ops.masks import paste_masks


def _chunk_plan(n: int, chunk: int, fixed: bool = False):
    """Greedy (start, size) decomposition: full chunks, then a binary
    decomposition of the remainder (sizes 8/4/2/1 — exact, no padding).
    Mixed-orientation batches split into small per-orientation groups;
    padding every group to the full chunk can double the compute (e.g. 1
    landscape shop + 10 portrait frames).  ``fixed=True`` pads every group
    to ``chunk`` instead (required when the batch axis is mesh-sharded)."""
    plan = []
    s = 0
    while n - s >= chunk:
        plan.append((s, chunk))
        s += chunk
    if s < n:
        if fixed:
            plan.append((s, chunk))
        else:
            size = 8
            while s < n:
                if size <= n - s:
                    plan.append((s, size))
                    s += size
                else:
                    size //= 2
    return plan


_FWD_CACHE = {}


def _jitted_forward(model, with_masks, with_match, with_roi_features,
                    with_aggr_features, mesh=None):
    """One jitted forward per (model config, export flags) — runners are
    re-created per epoch (frozen-detector weights change), and a fresh
    jax.jit closure each time would force a retrace.

    With ``mesh`` the forward is wrapped in shard_map over the 'data' axis
    (every op in MatchRCNN.inference is per-image independent).  Plain
    GSPMD auto-partitioning is NOT enough here: pallas_call (the serving
    RoIAlign/NLB kernels) is an opaque custom call XLA would replicate
    behind all-gathers instead of sharding."""
    key = (model.cfg, model.video, with_masks, with_match,
           with_roi_features, with_aggr_features, mesh)
    if key in _FWD_CACHE:
        return _FWD_CACHE[key]

    def fwd(variables, images, sizes):
        out = model.apply(
            variables, images, sizes, method=MatchRCNN.inference,
            with_masks=with_masks, with_match=with_match,
            with_roi_features=True,
        )
        if with_aggr_features:
            b, d = out["boxes"].shape[:2]
            roi = out["roi_features"].reshape(b * d, 14, 14, -1)
            aggr = model.apply(
                variables, roi, method=MatchRCNN.aggregator_descriptors
            )
            out["aggr_features"] = aggr.reshape(b, d, -1)
        if not with_roi_features:
            del out["roi_features"]
        return out

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        shard_map = getattr(jax, "shard_map", None)
        if shard_map is None:  # older jax
            from jax.experimental.shard_map import shard_map
        kw = dict(mesh=mesh, in_specs=(P(), P("data"), P("data")),
                  out_specs=P("data"))
        try:  # disable the varying-ness checker (device-invariant carries
            # inside NMS/while loops become varying mid-loop): jax>=0.8
            # spells it check_vma, older versions check_rep.
            fwd = shard_map(fwd, check_vma=False, **kw)
        except TypeError:
            fwd = shard_map(fwd, check_rep=False, **kw)
    _FWD_CACHE[key] = jax.jit(fwd)
    return _FWD_CACHE[key]


class InferenceRunner:
    def __init__(
        self,
        model: MatchRCNN,
        variables,
        chunk: int = 8,
        with_masks: bool = False,
        with_match: bool = True,
        with_roi_features: bool = False,
        with_aggr_features: bool = True,
        mesh=None,
        ingest: str = "host",
        paste_full_masks: bool = True,
    ):
        """``mesh``: optional jax Mesh — the image chunk is sharded over its
        'data' axis (multi-chip serving: frames are embarrassingly parallel;
        chunk should be a multiple of the axis size).

        ``ingest``: "host" resizes with cv2 before upload (reference-parity
        path); "device" uploads raw frames and runs the bilinear resize +
        canvas placement fused on the TPU (models/transform.device_batch_
        images — one compiled program per source geometry; host threads only
        decode).

        ``paste_full_masks``: with ``with_masks=True``, paste each 28x28
        canvas-space mask into the ORIGINAL image frame — [D, H_orig,
        W_orig] float probabilities — exactly what torchvision
        ``GeneralizedRCNN.postprocess`` does to the reference's eval
        outputs (paste_masks_in_image over the resized-back boxes; masks
        attached at /root/reference/models/video_matchrcnn.py:292).  False
        keeps the raw [D, 28, 28] box-space probs."""
        self.model = model
        self.variables = variables
        self.chunk = chunk
        self.with_masks = with_masks
        self.paste_full_masks = paste_full_masks
        self.with_roi = with_roi_features
        self.with_aggr = with_aggr_features
        self.with_match = with_match
        if ingest not in ("host", "device"):
            raise ValueError(f"unknown ingest {ingest!r}: 'host' or 'device'")
        self.ingest = ingest
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if chunk % mesh.shape["data"]:
                raise ValueError(
                    f"chunk ({chunk}) must be a multiple of the mesh 'data' "
                    f"axis size ({mesh.shape['data']}): the forward is "
                    "shard_map-ed over that axis (pallas kernels are not "
                    "GSPMD-partitionable)"
                )
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self.variables = jax.device_put(
                variables, NamedSharding(mesh, P())
            )
        self._fwd = _jitted_forward(
            model, with_masks, with_match, with_roi_features,
            with_aggr_features, mesh=mesh,
        )

    def __call__(self, images: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        """images: list of HWC float arrays in [0, 1].  Returns one dict per
        image (original order) with boxes in ORIGINAL image coordinates."""
        results, _ = self.run(images, device_keys=())
        return results

    def run(self, images: List[np.ndarray], device_keys=None):
        """Like __call__ but keeps the listed output keys ON DEVICE,
        returned separately as [N_images, ...] arrays in original order —
        the phase-2 training path feeds these straight back into the jitted
        head step, avoiding the device→host→device roundtrip of the
        reference's ``output = model(images); roi_features.append(...)``
        pattern (engine.py:113-144).

        ``device_keys`` defaults to ('roi_features',) when the runner was
        built with ``with_roi_features=True`` and () otherwise — a
        default-constructed runner's forward deletes that key, so the old
        unconditional default crashed."""
        if device_keys is None:
            device_keys = ("roi_features",) if self.with_roi else ()
        cfg = self.model.cfg.transform
        batcher = device_batch_images if self.ingest == "device" else batch_images
        results: List[Optional[Dict[str, np.ndarray]]] = [None] * len(images)
        dev_chunks = {k: [] for k in device_keys}
        order: List[int] = []
        for bucket in batcher(images, cfg):
            n = bucket.pixels.shape[0]
            for s, size in _chunk_plan(n, self.chunk, fixed=self.mesh is not None):
                e = s + min(size, n - s)
                pix = bucket.pixels[s:e]
                sz = bucket.sizes[s:e]
                pad = size - (e - s)
                if pad:
                    xp = jnp if isinstance(pix, jax.Array) else np
                    pix = xp.concatenate(
                        [pix, xp.zeros((pad,) + pix.shape[1:], pix.dtype)])
                    sz = np.concatenate([sz, np.tile(sz[-1:], (pad, 1))])
                pix_d, sz_d = jnp.asarray(pix), jnp.asarray(sz)
                if self.mesh is not None:
                    pix_d = jax.device_put(pix_d, self._batch_sharding)
                    sz_d = jax.device_put(sz_d, self._batch_sharding)
                out = self._fwd(self.variables, pix_d, sz_d)
                for k in device_keys:
                    dev_chunks[k].append(out[k][: e - s])
                host = jax.tree.map(
                    np.asarray, {k: v for k, v in out.items() if k not in device_keys}
                )
                for j in range(e - s):
                    gidx = bucket.indices[s + j]
                    r = {k: v[j] for k, v in host.items()}
                    r["boxes"] = resize_boxes_back(
                        r["boxes"], tuple(bucket.sizes[s + j]),
                        tuple(bucket.orig_sizes[s + j]),
                    )
                    if self.paste_full_masks and "masks" in r:
                        # torchvision postprocess order: boxes back to
                        # original coords FIRST, then paste at original size
                        oh, ow = map(int, bucket.orig_sizes[s + j])
                        r["masks"] = np.asarray(paste_masks(
                            jnp.asarray(r["masks"]),
                            jnp.asarray(r["boxes"], dtype=jnp.float32),
                            oh, ow))
                    results[gidx] = r
                order.extend(bucket.indices[s:e])
        device_out = {}
        if device_keys:
            inv = np.argsort(np.asarray(order))
            for k in device_keys:
                device_out[k] = jnp.concatenate(dev_chunks[k], axis=0)[jnp.asarray(inv)]
        return results, device_out
