"""High-level serving API: video-to-shop retrieval in three calls.

The reference has no serving surface — users must stitch together model
internals and the 400-line eval script.  This wraps the TPU pipeline into
the product-level operations:

    retr = SeamRetrieval.from_checkpoint("ckpt/seam_mf/final")
    gallery = retr.build_gallery(shop_images)           # once
    result = retr.retrieve(video_frames, gallery, k=5)  # per query video

Internally: jitted detector forward (canvas-bucketed), match-head
self-similarity tracking across frames, SEAM temporal aggregation of the
best tracklet, and a one-matmul gallery scoring pass — the aggr-desc
strategy, the reference's headline metric
(/root/reference/evaluate_movingfashion.py:253-277).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from .config import EvalConfig, ModelConfig, serving_model_config
from .eval.gallery import score_matrix
from .eval.runner import InferenceRunner
from .eval.tracking import build_tracklets
from .models.matchrcnn import MatchRCNN, init_model


@dataclasses.dataclass
class Gallery:
    match_feats: np.ndarray   # [G, 256]
    aggr_feats: np.ndarray    # [G, 256]
    keys: List[str]

    def save(self, path: str) -> str:
        """Persist the index (build once, serve many): a single .npz with
        both descriptor matrices and the product keys."""
        if not path.endswith(".npz"):
            path += ".npz"
        np.savez(path, match_feats=self.match_feats,
                 aggr_feats=self.aggr_feats,
                 keys=np.asarray(self.keys, dtype=object))
        return path

    @classmethod
    def load(cls, path: str) -> "Gallery":
        with np.load(path, allow_pickle=True) as z:
            return cls(match_feats=z["match_feats"],
                       aggr_feats=z["aggr_feats"],
                       keys=[str(k) for k in z["keys"]])


def decode_video_frames(path: str, n_frames: int = 10) -> List[np.ndarray]:
    """Decode ``n_frames`` uniformly-spaced frames of a video file as HWC
    float [0,1] RGB arrays (cv2 random-access seek, the reference's frame
    access pattern at /root/reference/datasets/MFDataset.py:59-66 with
    uniform fractions)."""
    import cv2

    cap = cv2.VideoCapture(path)
    total = cap.get(cv2.CAP_PROP_FRAME_COUNT)
    if total <= 0:
        cap.release()
        raise ValueError(f"cannot read video: {path}")
    frames = []
    for frac in np.linspace(0.0, 1.0, n_frames):
        cap.set(cv2.CAP_PROP_POS_FRAMES, min(int(total * frac), int(total) - 1))
        ok, frame = cap.read()
        if ok:
            frames.append(frame[:, :, ::-1].astype(np.float32) / 255.0)
    cap.release()
    if not frames:
        raise ValueError(f"no decodable frames in: {path}")
    return frames


def load_image_frames(paths: Sequence[str]) -> List[np.ndarray]:
    """Load image files as HWC float [0,1] RGB arrays."""
    import cv2

    frames = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"cannot read image: {p}")
        frames.append(img[:, :, ::-1].astype(np.float32) / 255.0)
    return frames


@dataclasses.dataclass
class RetrievalResult:
    indices: np.ndarray       # [k] gallery indices, best first
    scores: np.ndarray        # [k] match probabilities
    keys: List[str]
    track_length: int


class SeamRetrieval:
    def __init__(self, model: MatchRCNN, variables, cfg: Optional[EvalConfig] = None,
                 chunk: int = 8, mesh=None, ingest: str = "host"):
        self.model = model
        self.variables = variables
        self.cfg = cfg or EvalConfig()
        self.runner = InferenceRunner(model, variables, chunk=chunk, mesh=mesh,
                                      ingest=ingest)
        p = variables["params"]
        self._w = np.asarray(p["match_predictor"]["last"]["kernel"]).T
        self._b = np.asarray(p["match_predictor"]["last"]["bias"])
        self._aw = np.asarray(p["temporal_aggregator"]["last"]["kernel"]).T
        self._ab = np.asarray(p["temporal_aggregator"]["last"]["bias"])

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[ModelConfig] = None,
                        cfg_eval: Optional[EvalConfig] = None, **kw):
        """``cfg`` is the MODEL config; ``cfg_eval`` the retrieval
        thresholds (becomes the instance's ``cfg`` — the name differs here
        only to disambiguate the two)."""
        import os

        from .ckpt.io import restore_checkpoint
        from .ckpt.torch_convert import load_torch_checkpoint

        if cfg_eval is not None:
            kw["cfg"] = cfg_eval
        model, variables = init_model(cfg or serving_model_config(), video=True)
        if os.path.isdir(path):
            payload = restore_checkpoint(path)
            if "variables" in payload:          # phase-2 payload schema
                variables = payload["variables"]
            elif "state" in payload or "params" in payload:
                # phase-1 training payload ({'state': {params, batch_stats,
                # ...}}) or a bare variables dict: warm-start the video
                # model like phase-2 does (match -> aggregator clone,
                # /root/reference/models/video_matchrcnn.py:325-328)
                from .ckpt.torch_convert import load_pretrained_detector

                variables = load_pretrained_detector(path, variables)
            else:
                raise ValueError(
                    f"unrecognized checkpoint schema at {path}: keys "
                    f"{sorted(payload)} (expected 'variables' (phase-2) or "
                    "'state' (phase-1 training payload))")
        else:
            variables = load_torch_checkpoint(path, video=True)
        return cls(model, variables, **kw)

    def detect(self, images: Sequence[np.ndarray], with_masks: bool = True
               ) -> List[Dict[str, np.ndarray]]:
        """Per-image garment detection with FULL-IMAGE masks.

        Returns one dict per image: boxes [D,4] xyxy in original image
        coords, scores/labels/valid [D], and (``with_masks``) masks
        [D, H_orig, W_orig] float probabilities — the reference's eval
        detector output after torchvision ``GeneralizedRCNN.postprocess``
        (masks attached at /root/reference/models/video_matchrcnn.py:292,
        pasted by paste_masks_in_image).  Rows with ``valid`` False or
        scores below cfg.score_threshold are padding — filter them.

        The masks-enabled runner is built lazily and cached (its jitted
        forward differs from the retrieval runner's)."""
        key = ("detect", with_masks)
        runner = self._detect_runners.get(key) if hasattr(
            self, "_detect_runners") else None
        if runner is None:
            if not hasattr(self, "_detect_runners"):
                self._detect_runners = {}
            runner = InferenceRunner(
                self.model, self.variables, chunk=self.runner.chunk,
                mesh=self.runner.mesh, ingest=self.runner.ingest,
                with_masks=with_masks, with_match=False,
                with_aggr_features=False)
            self._detect_runners[key] = runner
        return runner(list(images))

    def _best_box(self, out, by_area=True):
        keep = np.nonzero((out["scores"] >= self.cfg.score_threshold) & out["valid"])[0]
        if keep.size == 0:
            return None
        if by_area:
            b = out["boxes"][keep]
            areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            return int(keep[np.argmax(areas)])
        return int(keep[np.argmax(out["scores"][keep])])

    def build_gallery(self, shop_images: Sequence[np.ndarray],
                      keys: Optional[List[str]] = None) -> Gallery:
        """shop_images: HWC float [0,1] arrays (one per product)."""
        outs = self.runner(list(shop_images))
        mf, af, kk = [], [], []
        for i, o in enumerate(outs):
            j = self._best_box(o)
            if j is None:
                continue
            mf.append(o["match_features"][j])
            af.append(o["aggr_features"][j])
            kk.append(keys[i] if keys else str(i))
        if not mf:
            raise ValueError(
                "no shop image produced a detection >= score_threshold "
                f"({self.cfg.score_threshold}) — cannot build a gallery")
        return Gallery(np.stack(mf), np.stack(af), kk)

    def embed_video(self, frames: Sequence[np.ndarray]) -> Dict[str, np.ndarray]:
        """Detect garments in the frames, track the dominant garment via
        match-head self-similarity, and aggregate its per-frame descriptors.

        Returns {'aggr': [256], 'frames': [T, 256] match feats,
        'track_rows': indices, 'n_boxes': int}.
        """
        outs = self.runner(list(frames))
        feats, aggr, img_of, scores = [], [], [], []
        for i, o in enumerate(outs):
            keep = np.nonzero((o["scores"] >= self.cfg.score_threshold) & o["valid"])[0]
            for j in keep:
                feats.append(o["match_features"][j])
                aggr.append(o["aggr_features"][j])
                img_of.append(i)
                scores.append(float(o["scores"][j]))
        if not feats:
            raise ValueError("no detections in the video frames")
        feats = np.stack(feats)
        aggr = np.stack(aggr)
        img_of = np.asarray(img_of)
        scores = np.asarray(scores)

        self_sim = score_matrix(feats, feats, self._w, self._b)
        tracks = build_tracklets(self_sim, scores, img_of, self.cfg.tracking_threshold)
        # serving has no GT oracle: take the tracklet with the highest summed
        # detection score (longest/most-confident garment track)
        best = int(np.argmax([scores[np.asarray(t)].sum() for t in tracks]))
        rows = np.asarray(tracks[best])

        import jax.numpy as jnp

        seqs = aggr[rows][None]                       # [1, T, 256]
        mask = np.ones((1, len(rows)), bool)
        agg = np.asarray(self.model.apply(
            self.variables, jnp.asarray(seqs), jnp.asarray(mask),
            method=MatchRCNN.aggregate_sequences,
        ))[0]
        return {"aggr": agg, "frames": feats[rows], "track_rows": rows,
                "n_boxes": len(feats)}

    def retrieve(self, frames: Sequence[np.ndarray], gallery: Gallery,
                 k: int = 5) -> RetrievalResult:
        emb = self.embed_video(frames)
        scores = score_matrix(emb["aggr"][None], gallery.aggr_feats,
                              self._aw, self._ab)[0]
        order = np.argsort(scores)[::-1][:k]
        return RetrievalResult(
            indices=order,
            scores=scores[order],
            keys=[gallery.keys[i] for i in order],
            track_length=len(emb["track_rows"]),
        )

    def retrieve_video(self, path: str, gallery: Gallery, k: int = 5,
                       n_frames: int = 10) -> RetrievalResult:
        """Query straight from a video file: uniform-fraction decode →
        detect/track/aggregate → gallery scoring."""
        return self.retrieve(decode_video_frames(path, n_frames), gallery, k)
