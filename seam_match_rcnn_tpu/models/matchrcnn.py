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

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.boxes import box_iou, encode_boxes
from ..ops.roi_align import batched_multilevel_roi_align
from .anchors import grid_anchors
from .detection import postprocess_detections, prepend_gt
from .heads import FastRCNNPredictor, MaskHead, MaskPredictor, RPNHead, TwoMLPHead
from .match_head import MatchPredictor, TemporalAggregator
from .resnet import BackboneWithFPN
from .rpn import select_proposals
from .transform import normalize


def _select_match_slots(
    pos_props: jnp.ndarray,
    pos_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``filter_proposals`` (match_head.py:441-463): keep, per GT,
    the top (k // n_gt) positive proposals ranked by IoU against the GTs
    (duplicates across GTs allowed, as in the reference's view(-1)).

    Note: the reference feeds xyxy boxes to pycocotools' xywh-convention
    ``maskUtils.iou`` (match_head.py:451) so its ranking quantity is skewed;
    we rank by correct IoU (documented divergence — affects only which
    positives feed the match head during training).

    Returns (slot_idx [k] into pos_props, slot_valid [k]).
    """
    p = pos_props.shape[0]
    n_gt = jnp.maximum(jnp.sum(gt_valid), 1)
    per_gt = k // n_gt  # 0 when n_gt > k, like the reference's 8 // n_valid
    iou = box_iou(pos_props, gt_boxes)  # [P, G]
    iou = jnp.where(pos_valid[:, None] & gt_valid[None, :], iou, -1.0)
    # rank of each row within each column (0 = best)
    order = jnp.argsort(-iou, axis=0)
    ranks = jnp.argsort(order, axis=0)
    sel = (ranks < per_gt) & (iou > -1.0)  # [P, G]
    # compact up to k selected (p, g) cells; prefer column-major order like
    # the reference's per-gt loop.
    flat = sel.T.reshape(-1)  # [G * P], column-major
    keys = jnp.where(flat, 1e9 - jnp.arange(flat.shape[0], dtype=jnp.float32), -jnp.arange(flat.shape[0], dtype=jnp.float32))
    _, top = jax.lax.top_k(keys, k)
    slot_valid = flat[top]
    slot_idx = (top % p).astype(jnp.int32)
    return jnp.where(slot_valid, slot_idx, 0), slot_valid


class MatchRCNN(nn.Module):
    """cfg.video=False: phase-1 Match R-CNN (fallback score 1.0,
    matchrcnn.py:378).  video=True: SEAM VideoMatchRCNN with the temporal
    aggregator (fallback score 0.1, video_matchrcnn.py:251)."""

    cfg: ModelConfig
    video: bool = False

    def setup(self):
        dt = jnp.dtype(self.cfg.compute_dtype)
        self.backbone = BackboneWithFPN(
            dtype=dt, remat=self.cfg.remat_backbone,
            freeze_stages=self.cfg.freeze_backbone_stages,
            stem_backend=self.cfg.stem_backend, name="backbone"
        )
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
        # Trunk compute dtype is a separate knob (MatchHeadConfig.trunk_dtype,
        # default f32 = reference numerics): descriptors feed the retrieval
        # parity gate, so they do NOT follow compute_dtype automatically.
        tdt = jnp.dtype(self.cfg.match.trunk_dtype)
        self.match_predictor = MatchPredictor(dtype=tdt, name="match_predictor")
        if self.video:
            self.temporal_aggregator = TemporalAggregator(
                n_frames=self.cfg.match.n_frames,
                nlb_backend=self.cfg.match.nlb_backend,
                dtype=tdt,
                name="temporal_aggregator",
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

    def _quantize_pyramid(self, feats):
        """Once-per-forward int8 quantization for the pallas_int8 backend —
        threaded through box/mask roi calls so the full-pyramid pass is not
        repeated per call site."""
        if self.cfg.roi_heads.roi_align_backend != "pallas_int8":
            return None
        from ..ops.pallas_roi_align import quantize_features_int8

        return quantize_features_int8(feats[:4])

    def _roi_align(self, feats, rois, output_size, roi_chunk, prequant=None):
        c = self.cfg.roi_heads

        def fixup(out):
            # exact-fixup escape hatch for patch-clamped rois (budget 0 = off)
            if c.roi_align_fixup_budget <= 0:
                return out
            from ..ops.pallas_roi_align import apply_exact_fixup

            return apply_exact_fixup(
                tuple(feats[:4]), rois, out, output_size, c.sampling_ratio,
                c.roi_align_fixup_budget,
            )

        if c.roi_align_backend == "pallas":
            # differentiable: pallas forward, exact adjoint backward
            # (c.roi_adjoint_backend selects scatter-add vs the resident
            # adjoint kernel).  out_dtype = the compute dtype: the kernel
            # rounds at its store instead of a separate full-size cast op
            # (identical values, half the HBM traffic on the 4000-roi
            # serving box branch).
            from ..ops.pallas_roi_align import pallas_roi_align_trainable

            return fixup(pallas_roi_align_trainable(
                tuple(feats[:4]), rois, output_size, c.sampling_ratio,
                jnp.dtype(feats[0].dtype), c.roi_adjoint_backend,
            ))
        if c.roi_align_backend == "pallas_int8":
            from ..ops.pallas_roi_align import pallas_roi_align_batched

            feats4, scales = (prequant if prequant is not None
                              else self._quantize_pyramid(feats))
            return fixup(pallas_roi_align_batched(
                feats4, rois, output_size, sampling_ratio=c.sampling_ratio,
                scales=scales, out_dtype=jnp.dtype(feats[0].dtype),
            ))
        if c.roi_align_backend == "pallas_resident":
            # tile-resident kernel (shared VMEM tiles instead of per-roi HBM
            # DMA, ~9x fewer HBM bytes); differentiable via the exact-adjoint
            # custom_vjp wrapper (trainable in phase-1).  Generic call sites
            # unpermute the pooled features; the hot 4000-roi box branch
            # uses the sorted fast path instead (box_branch below).
            pooled, order = self._resident_roi(feats, rois, output_size)
            b, r = rois.shape[:2]
            # invert the tile-sort with a GATHER of the big pooled array
            # (TPU scatters serialize; the inverting scatter is on [N] ints)
            inv = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0], dtype=order.dtype))
            out = jnp.take(pooled, inv, axis=0)
            return fixup(out.reshape((b, r) + out.shape[1:]))
        if c.roi_align_backend != "xla":
            raise ValueError(
                f"unknown roi_align_backend {c.roi_align_backend!r}; "
                "expected 'xla', 'pallas', 'pallas_int8' or 'pallas_resident'"
            )
        return batched_multilevel_roi_align(
            feats[:4], rois, output_size,
            sampling_ratio=c.sampling_ratio, roi_chunk=roi_chunk,
        )

    def _resident_roi(self, feats, rois, output_size):
        # NOTE: box_branch and mask_roi each call this inside one jitted
        # forward; the kernel's full-pyramid pad is roi-independent and XLA
        # CSE merges the duplicates (verified in compiled HLO: one pad op
        # per FPN level, not two) — no prequant-style hoist needed.
        from ..ops.pallas_roi_align_resident import (
            pallas_roi_align_resident_trainable)

        c = self.cfg.roi_heads
        # Cap the kernel's chunk at the (static) roi count so small streams
        # (e.g. the ~100-detection mask/match branch, or single-image serve
        # queries) aren't padded up to the 2048-roi serving chunk — the pad
        # rois would be pooled for real.  2048 is the measured end-to-end
        # optimum: chunk 4096 wins the kernel microbench (1.009 vs
        # 1.026 µs/roi) but LOSES the full pipeline (79.30 vs 79.72 fps,
        # back-to-back A/B — PERF.md round 4), so the microbench alone must
        # not settle this knob.
        n = rois.shape[0] * rois.shape[1]
        chunk = min(2048, -(-n // 8) * 8)
        # trainable wrapper: identical forward; custom_vjp (exact adjoint,
        # c.roi_adjoint_backend selects scatter-add vs the resident
        # adjoint kernel) makes the resident backend usable in phase-1
        return pallas_roi_align_resident_trainable(
            tuple(feats[:4]), rois, output_size, c.sampling_ratio,
            chunk, jnp.dtype(feats[0].dtype), c.roi_adjoint_backend,
        )

    def box_roi(self, feats, rois, prequant=None):
        """[B, R, 4] -> [B, R, 7, 7, 256]."""
        return self._roi_align(feats, rois, self.cfg.roi_heads.box_roi_output,
                               500, prequant)

    def mask_roi(self, feats, rois, roi_chunk: int = 128, prequant=None):
        return self._roi_align(feats, rois, self.cfg.roi_heads.mask_roi_output,
                               roi_chunk, prequant)

    def box_branch(self, feats, rois, prequant=None):
        """-> class_logits [B, R, C] f32, deltas [B, R, 4C] f32."""
        b, r = rois.shape[:2]
        s = self.cfg.roi_heads.box_roi_output
        rh = self.cfg.roi_heads
        if rh.roi_align_backend == "pallas_resident" and rh.roi_align_fixup_budget <= 0:
            # sorted fast path: run the head on the tile-sorted pooled
            # features and unpermute only the small per-roi head outputs
            # (~70 floats/roi) instead of the 25 KB/roi pooled features.
            pooled, order = self._resident_roi(feats, rois, s)
            x = self.box_head(pooled.reshape(b * r, s, s, -1))
            logits, deltas = self.box_predictor(x)
            logits = jnp.zeros_like(logits).at[order].set(logits)
            deltas = jnp.zeros_like(deltas).at[order].set(deltas)
        else:
            x = self.box_roi(feats, rois, prequant).reshape(b * r, s, s, -1)
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
        pq = self._quantize_pyramid(feats)
        _, (props, _, pvalid) = self.proposals(feats, image_sizes, training=False)
        class_logits, box_deltas = self.box_branch(feats, props, prequant=pq)
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
        roi14 = self.mask_roi(feats, det.boxes, prequant=pq).astype(jnp.float32)
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


    # ---- phase-1 training forward --------------------------------------

    def _train_core(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Dict[str, jnp.ndarray],
        rng: jax.Array,
        num_match_slots: int = 8,
        num_mask_slots: int = 128,
        profile_stage: Optional[str] = None,
    ):
        """Shared phase-1 forward: detector losses as UNNORMALIZED
        (sum, denominator) parts plus the match-branch RoI exports.

        The cls/box/mask normalizers span the whole training batch in the
        reference (torchvision fastrcnn_loss / maskrcnn_loss over the
        concatenated image list), so orientation-bucketed training must sum
        parts across buckets before dividing — ``training_losses``
        normalizes for the single fused batch; ``train_export`` hands the
        parts to train/steps.Phase1Trainer for the multi-bucket case.

        ``profile_stage`` (measurement hook for tools/profile_train.py, the
        training analogue of tools/profile_serving.py's cumulative
        prefixes): return after the named pipeline prefix — "backbone",
        "rpn" (adds RPN head + proposal NMS + RPN loss), "sample" (adds
        proposal assignment/sampling, all stop-gradient), "boxbranch",
        "mask".  None (production) runs everything.  Truncated returns are
        (partial parts, None, None); stages that end before any loss term
        carry a "probe" scalar so the prefix stays live under jit.
        """
        from ..losses import detection as det_losses
        from ..ops.targets import assign_and_sample

        cfg = self.cfg.roi_heads
        b = images.shape[0]
        feats = self.features(images)
        if profile_stage == "backbone":
            return {"probe": sum(jnp.sum(f.astype(jnp.float32))
                                 for f in feats)}, None, None
        pq = self._quantize_pyramid(feats)
        (obj, regs), (props, _, pvalid) = self.proposals(
            feats, image_sizes, training=True
        )
        props = jax.lax.stop_gradient(props)

        # --- RPN loss over all anchors ---------------------------------
        canvas = (feats[0].shape[1] * 4, feats[0].shape[2] * 4)
        anchors_np = grid_anchors(
            canvas,
            tuple((f.shape[1], f.shape[2]) for f in feats),
            tuple(self.cfg.anchors.sizes),
            tuple(self.cfg.anchors.aspect_ratios),
        )
        anchors_all = jnp.concatenate([jnp.asarray(a) for a in anchors_np], 0)
        obj_flat = jnp.concatenate(
            [o.astype(jnp.float32).reshape(b, -1) for o in obj], axis=1
        )
        reg_flat = jnp.concatenate(
            [r.astype(jnp.float32).reshape(b, -1, 4) for r in regs], axis=1
        )
        rngs = jax.random.split(rng, 3)
        rpn_rngs = jax.random.split(rngs[0], b)
        loss_obj, loss_rpn_box = jax.vmap(
            lambda o, d, g, gv, r: det_losses.rpn_loss(
                o, d, anchors_all, g, gv, r,
                self.cfg.rpn.batch_size_per_image,
                self.cfg.rpn.positive_fraction,
                self.cfg.rpn.fg_iou_thresh, self.cfg.rpn.bg_iou_thresh,
            )
        )(obj_flat, reg_flat, gt["boxes"], gt["valid"], rpn_rngs)
        # per-image means; the batch mean is numerator/B (B known to callers)
        obj_sum, rpn_box_sum = jnp.sum(loss_obj), jnp.sum(loss_rpn_box)
        if profile_stage == "rpn":
            return {"obj_sum": obj_sum, "rpn_box_sum": rpn_box_sum}, None, None

        # --- proposal sampling (gt appended, matchrcnn.py:130-136) ------
        all_props = jnp.concatenate([props, gt["boxes"]], axis=1)
        all_valid = jnp.concatenate([pvalid, gt["valid"]], axis=1)
        samp_rngs = jax.random.split(rngs[1], b)
        matched, labels, sample = jax.vmap(
            lambda p, pv, g, gl, gv, r: assign_and_sample(
                p, pv, g, gl, gv, r,
                cfg.batch_size_per_image, cfg.positive_fraction,
                cfg.fg_iou_thresh, cfg.bg_iou_thresh,
            )
        )(all_props, all_valid, gt["boxes"], gt["labels"], gt["valid"], samp_rngs)

        take = lambda arr, idx: jnp.take_along_axis(arr, idx, axis=1)
        s_idx = sample.idx                                  # [B, 512]
        s_props = jnp.take_along_axis(all_props, s_idx[..., None], axis=1)
        s_labels = take(labels, s_idx)
        s_matched = take(matched, s_idx)
        s_valid = sample.valid
        if profile_stage == "sample":
            return {"obj_sum": obj_sum, "rpn_box_sum": rpn_box_sum,
                    "probe": jnp.sum(s_props)}, None, None

        # --- box branch -------------------------------------------------
        class_logits, box_deltas = self.box_branch(feats, s_props, prequant=pq)
        matched_gt = jnp.take_along_axis(gt["boxes"], s_matched[..., None], axis=1)
        reg_targets = encode_boxes(matched_gt, s_props, cfg.bbox_reg_weights)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        cls_sum, box_sum, samp_n = det_losses.fastrcnn_loss_parts(
            flat(class_logits), flat(box_deltas), flat(s_labels),
            flat(reg_targets), flat(s_valid),
        )
        if profile_stage == "boxbranch":
            return {"obj_sum": obj_sum, "rpn_box_sum": rpn_box_sum,
                    "cls_sum": cls_sum, "box_sum": box_sum,
                    "samp_n": samp_n}, None, None

        # --- mask branch (positives only, matchrcnn.py:382-405) ---------
        m = min(num_mask_slots, s_props.shape[1])
        m_props = s_props[:, :m]
        m_valid = sample.is_pos[:, :m]   # sampler packs positives first
        m_matched = s_matched[:, :m]
        m_labels = s_labels[:, :m]
        roi14 = self.mask_roi(feats, m_props, prequant=pq)
        mask_logits = self.mask_branch(roi14.reshape(b * m, 14, 14, -1))
        mask_t = jax.vmap(
            lambda crops, gb, p, mi: det_losses.mask_targets_from_crops(
                crops, gb, p, mi
            )
        )(gt["mask_crops"].astype(jnp.float32), gt["boxes"], m_props, m_matched)
        mask_sum, mask_n = det_losses.maskrcnn_loss_parts(
            mask_logits, flat(mask_t), flat(m_labels), flat(m_valid)
        )
        if profile_stage == "mask":
            return {"obj_sum": obj_sum, "rpn_box_sum": rpn_box_sum,
                    "cls_sum": cls_sum, "box_sum": box_sum,
                    "samp_n": samp_n, "mask_sum": mask_sum,
                    "mask_n": mask_n}, None, None

        # --- match branch RoIs (top-iou positives, match_head.py:441-463)
        k = num_match_slots
        slot_idx, slot_valid = jax.vmap(
            lambda p, pv, g, gv: _select_match_slots(p, pv, g, gv, k)
        )(m_props, m_valid, gt["boxes"], gt["valid"])
        mt_matched = jnp.take_along_axis(m_matched, slot_idx, axis=1)
        mt_roi = jnp.take_along_axis(
            roi14, slot_idx[..., None, None, None], axis=1
        ).astype(jnp.float32)

        parts = {
            "obj_sum": obj_sum,
            "rpn_box_sum": rpn_box_sum,
            "cls_sum": cls_sum,
            "box_sum": box_sum,
            "samp_n": samp_n,
            "mask_sum": mask_sum,
            "mask_n": mask_n,
        }
        meta = {
            "pair_ids": flat(
                jnp.take_along_axis(gt["pair_ids"], mt_matched, axis=1)),
            "styles": flat(
                jnp.take_along_axis(gt["styles"], mt_matched, axis=1)),
            "src": jnp.repeat(gt["source"], k),
            "valid": flat(slot_valid),
        }
        return parts, mt_roi.reshape((b * k,) + mt_roi.shape[2:]), meta

    def match_loss_from_rois(self, rois, meta) -> jnp.ndarray:
        """Supervised match loss over exported match-slot RoIs
        (reference models/match_head.py:441-505).  rois: [N, 14, 14, C]
        f32; meta: pair_ids/styles/src/valid, all [N].  Module method so
        it binds self.match_predictor (its BN trains over the FULL slot
        set — pass the whole batch's slots, never one bucket's)."""
        from ..losses.match import match_loss_supervised

        desc = self.match_predictor.descriptors(
            rois, train=True, valid=meta["valid"],
        )
        logits = self.match_predictor.score_pairs(desc, desc)
        sv = meta["valid"]
        return match_loss_supervised(
            logits, meta["pair_ids"], meta["styles"],
            meta["pair_ids"], meta["styles"],
            sv & (meta["src"] == 0), sv & (meta["src"] == 1),
            require_nonzero_style=True,
        )

    @staticmethod
    def det_losses_from_parts(parts, n_images, mask_px: int = 28 * 28):
        """Normalize detector-loss parts (possibly summed across
        orientation buckets) exactly like the fused batch."""
        samp_n = jnp.maximum(parts["samp_n"], 1)
        return {
            "loss_objectness": parts["obj_sum"] / n_images,
            "loss_rpn_box_reg": parts["rpn_box_sum"] / n_images,
            "loss_classifier": parts["cls_sum"] / samp_n,
            "loss_box_reg": parts["box_sum"] / samp_n,
            "loss_mask": parts["mask_sum"]
            / (jnp.maximum(parts["mask_n"], 1) * mask_px),
        }

    def train_export(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Dict[str, jnp.ndarray],
        rng: jax.Array,
        num_match_slots: int = 8,
        num_mask_slots: int = 128,
    ):
        """Bucket export for linked multi-orientation training
        (train/steps.Phase1Trainer): (detector loss parts, match RoIs
        [B*k, 14, 14, C], slot metadata)."""
        return self._train_core(
            images, image_sizes, gt, rng, num_match_slots, num_mask_slots)

    def training_losses(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Dict[str, jnp.ndarray],
        rng: jax.Array,
        num_match_slots: int = 8,
        num_mask_slots: int = 128,
    ) -> Dict[str, jnp.ndarray]:
        """Supervised Match R-CNN losses (reference phase-1 step:
        /root/reference/models/matchrcnn.py:333-472 in training mode).

        gt: boxes [B,G,4], labels [B,G], valid [B,G], pair_ids [B,G],
        styles [B,G], source [B] (0 street / 1 shop, image-level — the
        reference reads targets['sources'][0] at matchrcnn.py:435),
        mask_crops [B,G,S,S] (per-gt fixed-size mask crops).
        """
        parts, mt_roi, meta = self._train_core(
            images, image_sizes, gt, rng, num_match_slots, num_mask_slots)
        losses = self.det_losses_from_parts(parts, images.shape[0])
        losses["loss_match"] = self.match_loss_from_rois(mt_roi, meta)
        return losses

    def profile_losses(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Dict[str, jnp.ndarray],
        rng: jax.Array,
        stage: str,
    ) -> jnp.ndarray:
        """Scalar loss over the cumulative training-pipeline prefix named by
        ``stage`` — the measurement surface of tools/profile_train.py (the
        phase-1 analogue of the serving stage profiler behind PERF.md's
        breakdown tables).  ``stage="match"``/``"full"`` is exactly
        ``sum(training_losses)``; earlier stages normalize whichever loss
        parts exist at that prefix (same normalizers as
        ``det_losses_from_parts``) plus a tiny probe term keeping loss-free
        prefixes live under jit."""
        if stage in ("match", "full"):
            return sum(self.training_losses(images, image_sizes, gt, rng)
                       .values())
        parts, _, _ = self._train_core(
            images, image_sizes, gt, rng, profile_stage=stage)
        total = jnp.float32(0)
        if "probe" in parts:
            total = total + parts["probe"] * jnp.float32(1e-6)
        if "obj_sum" in parts:
            total = total + (parts["obj_sum"] + parts["rpn_box_sum"]) \
                / images.shape[0]
        if "cls_sum" in parts:
            samp_n = jnp.maximum(parts["samp_n"], 1)
            total = total + (parts["cls_sum"] + parts["box_sum"]) / samp_n
        if "mask_sum" in parts:
            total = total + parts["mask_sum"] / (
                jnp.maximum(parts["mask_n"], 1) * (28 * 28))
        return total

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
    # jit the init: flax init otherwise executes the whole detector eagerly
    # op-by-op, which is minutes on CPU hosts.
    init_fn = jax.jit(
        lambda r, im, sz: model.init(r, im, sz, method=MatchRCNN.init_all)
    )
    variables = init_fn(rng, images, sizes)
    return model, variables
