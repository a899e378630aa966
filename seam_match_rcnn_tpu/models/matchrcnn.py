"""Match R-CNN / SEAM (video) Match R-CNN — the full detector, TPU-native.

Re-design of /root/reference/models/matchrcnn.py (``MatchRCNN`` +
``NewRoIHeads``) and /root/reference/models/video_matchrcnn.py
(``VideoMatchRCNN`` + ``TemporalRoIHeads``).  One flax module holds every
sub-network; the whole inference pipeline — backbone → RPN → proposal NMS →
box branch → class NMS → mask branch → match branch — runs as a single
jitted program with static shapes.

The serving path mirrors TemporalRoIHeads' inference outputs
(video_matchrcnn.py:297-314): per-detection 256-d ``match_features``, raw
14x14x256 ``roi_features``, per-label mask probabilities, and the match
scorer's (w, b) so gallery scoring can run outside the model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.roi_align import batched_multilevel_roi_align
from .anchors import grid_anchors
from .detection import Detections, postprocess_detections, prepend_gt
from .heads import FastRCNNPredictor, MaskHead, MaskPredictor, RPNHead, TwoMLPHead
from .match_head import MatchPredictor, TemporalAggregator
from .resnet import BackboneWithFPN
from .rpn import select_proposals
from .transform import normalize


class MatchRCNN(nn.Module):
    """cfg.video=False: phase-1 Match R-CNN (fallback score 1.0,
    matchrcnn.py:378).  video=True: SEAM VideoMatchRCNN with the temporal
    aggregator (fallback score 0.1, video_matchrcnn.py:251)."""

    cfg: ModelConfig
    video: bool = False

    def setup(self):
        dt = jnp.dtype(self.cfg.compute_dtype)
        self.backbone = BackboneWithFPN(dtype=dt, name="backbone")
        self.rpn_head = RPNHead(
            self.cfg.anchors.num_anchors_per_location, dtype=dt, name="rpn_head"
        )
        self.box_head = TwoMLPHead(dtype=dt, name="box_head")
        self.box_predictor = FastRCNNPredictor(
            self.cfg.num_classes, dtype=dt, name="box_predictor"
        )
        self.mask_head = MaskHead(dtype=dt, name="mask_head")
        self.mask_predictor = MaskPredictor(
            self.cfg.num_classes, dtype=dt, name="mask_predictor"
        )
        self.match_predictor = MatchPredictor(name="match_predictor")
        if self.video:
            self.temporal_aggregator = TemporalAggregator(
                n_frames=self.cfg.match.n_frames, name="temporal_aggregator"
            )

    # ---- building blocks ----------------------------------------------

    def features(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """images: [B, H, W, 3] in [0,1] -> (P2..P6)."""
        x = normalize(images, self.cfg.transform)
        x = x.astype(jnp.dtype(self.cfg.compute_dtype))
        return self.backbone(x)

    def rpn_outputs(self, feats):
        return self.rpn_head(feats)

    def proposals(self, feats, image_sizes, training: bool):
        obj, regs = self.rpn_head(feats)
        canvas = (feats[0].shape[1] * 4, feats[0].shape[2] * 4)
        anchors = [
            jnp.asarray(a)
            for a in grid_anchors(
                canvas,
                tuple((f.shape[1], f.shape[2]) for f in feats),
                tuple(self.cfg.anchors.sizes),
                tuple(self.cfg.anchors.aspect_ratios),
            )
        ]
        obj32 = [o.astype(jnp.float32) for o in obj]
        regs32 = [r.astype(jnp.float32) for r in regs]
        props, scores, valid = select_proposals(
            obj32, regs32, anchors, image_sizes, self.cfg.rpn, training
        )
        return (obj, regs), (props, scores, valid)

    def box_roi(self, feats, rois):
        """[B, R, 4] -> [B, R, 7, 7, 256]."""
        c = self.cfg.roi_heads
        return batched_multilevel_roi_align(
            feats[:4], rois, c.box_roi_output, sampling_ratio=c.sampling_ratio
        )

    def mask_roi(self, feats, rois, roi_chunk: int = 128):
        c = self.cfg.roi_heads
        return batched_multilevel_roi_align(
            feats[:4], rois, c.mask_roi_output,
            sampling_ratio=c.sampling_ratio, roi_chunk=roi_chunk,
        )

    def box_branch(self, feats, rois):
        """-> class_logits [B, R, C] f32, deltas [B, R, 4C] f32."""
        b, r = rois.shape[:2]
        s = self.cfg.roi_heads.box_roi_output
        x = self.box_roi(feats, rois).reshape(b * r, s, s, -1)
        x = self.box_head(x)
        logits, deltas = self.box_predictor(x)
        c = self.cfg.num_classes
        return (
            logits.reshape(b, r, c).astype(jnp.float32),
            deltas.reshape(b, r, 4 * c).astype(jnp.float32),
        )

    def mask_branch(self, roi_feats):
        """[N, 14, 14, 256] -> mask logits [N, 28, 28, C] f32."""
        x = self.mask_head(roi_feats)
        return self.mask_predictor(x).astype(jnp.float32)

    def match_descriptors(self, roi_feats, train: bool = False):
        return self.match_predictor.descriptors(
            roi_feats.astype(jnp.float32), train=train
        )

    def aggregator_descriptors(self, roi_feats, train: bool = False):
        return self.temporal_aggregator.descriptors(
            roi_feats.astype(jnp.float32), train=train
        )

    def aggregate_sequences(self, seqs, mask):
        return self.temporal_aggregator.aggregate(seqs, mask)

    def aggregator_score(self, street_desc, shop_desc):
        return self.temporal_aggregator.score_pairs(street_desc, shop_desc)

    def match_score(self, street_desc, shop_desc):
        return self.match_predictor.score_pairs(street_desc, shop_desc)

    # ---- serving forward ----------------------------------------------

    def inference(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Optional[Dict[str, jnp.ndarray]] = None,
        with_masks: bool = True,
        with_match: bool = True,
        with_roi_features: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Full eval-mode forward for a canvas batch.

        images: [B, H, W, 3]; image_sizes: [B, 2] valid (h, w).
        gt (optional, video eval path): dict with boxes [B, G, 4],
        labels [B, G], valid [B, G] — prepended with score 1.0
        (video_matchrcnn.py:255-262).
        """
        feats = self.features(images)
        _, (props, _, pvalid) = self.proposals(feats, image_sizes, training=False)
        class_logits, box_deltas = self.box_branch(feats, props)
        det = postprocess_detections(
            class_logits, box_deltas, props, pvalid, image_sizes,
            self.cfg.roi_heads,
            fallback_score=0.1 if self.video else 1.0,
        )
        if gt is not None:
            det = prepend_gt(det, gt["boxes"], gt["labels"], gt["valid"])

        out: Dict[str, jnp.ndarray] = {
            "boxes": det.boxes,
            "scores": det.scores,
            "labels": det.labels,
            "valid": det.valid,
        }

        b, d = det.boxes.shape[:2]
        roi14 = self.mask_roi(feats, det.boxes).astype(jnp.float32)
        if with_roi_features:
            out["roi_features"] = roi14
        if with_masks:
            logits = self.mask_branch(roi14.reshape(b * d, 14, 14, -1))
            probs = jax.nn.sigmoid(logits)
            lbl = jnp.maximum(det.labels.reshape(b * d), 0)
            per_label = jnp.take_along_axis(
                probs, lbl[:, None, None, None], axis=-1
            )[..., 0]
            out["masks"] = per_label.reshape(b, d, 28, 28)
        if with_match:
            desc = self.match_descriptors(roi14.reshape(b * d, 14, 14, -1))
            out["match_features"] = desc.reshape(b, d, -1)
        return out


    def init_all(self, images, image_sizes):
        """Initialization-only forward touching every submodule (flax creates
        params lazily, and ``inference`` alone never calls the pair scorers
        or the aggregator)."""
        out = self.inference(images, image_sizes)
        d = out["match_features"].reshape(-1, 256)[:1]
        out["_match_logits"] = self.match_predictor.score_pairs(d, d)
        if self.video:
            roi = out["roi_features"].reshape(-1, 14, 14, 256)[:1]
            gather = jnp.zeros((1, 2), jnp.int32)
            mask = jnp.ones((1, 2), bool)
            shop = jnp.zeros((1,), jnp.int32)
            self.temporal_aggregator(roi, gather, mask, shop)
        return out


def make_model(cfg: ModelConfig, video: bool = False) -> MatchRCNN:
    return MatchRCNN(cfg=cfg, video=video)


def init_model(
    cfg: ModelConfig, video: bool = False, rng: Optional[jax.Array] = None,
    canvas: Tuple[int, int] = (256, 320),
):
    """Initialize parameters with a small dummy canvas (shapes are
    size-agnostic)."""
    model = make_model(cfg, video)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    images = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    sizes = jnp.asarray([[canvas[0], canvas[1]]], jnp.int32)
    variables = model.init(rng, images, sizes, method=MatchRCNN.init_all)
    return model, variables
