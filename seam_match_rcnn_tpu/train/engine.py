"""Epoch-level training engines.

Re-design of /root/reference/stuffs/engine.py:
  * ``train_one_epoch_matchrcnn`` (:18-71)   — phase-1 supervised loop.
  * ``train_one_epoch_movingfashion`` (:76-199) — phase-2 SEAM loop.
  * ``train_one_epoch_multiDF2`` (:202-340)  — MultiDF2 aggregator loop.

Host responsibilities: canvas batching, GT padding, the data-dependent box
selection between the frozen-detector pass and the head step, NaN guard
(reference hard-exits at engine.py:56-60 — here we raise), metric logging.
All math runs in the jitted steps.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transform import batch_images
from ..utils.logging import MetricLogger, ScalarWriter
from . import seam as seam_mod
from .steps import Phase1Trainer


class NonFiniteLossError(RuntimeError):
    pass


def _check_finite(losses: Dict[str, float], context: str):
    total = sum(float(v) for v in losses.values())
    if not math.isfinite(total):
        # reference prints and sys.exit(1)s (engine.py:56-60)
        raise NonFiniteLossError(f"Loss is {total} at {context}: {losses}")


def pad_targets(
    targets: List[Dict[str, np.ndarray]], g_max: int, crop_size: int
) -> Dict[str, np.ndarray]:
    """Pad per-image GT dicts to a [B, G_max, ...] batch with validity."""
    b = len(targets)
    out = {
        "boxes": np.zeros((b, g_max, 4), np.float32),
        "labels": np.zeros((b, g_max), np.int32),
        "valid": np.zeros((b, g_max), bool),
        "pair_ids": np.zeros((b, g_max), np.int32),
        "styles": np.zeros((b, g_max), np.int32),
        "source": np.zeros((b,), np.int32),
        "mask_crops": np.zeros((b, g_max, crop_size, crop_size), np.uint8),
    }
    for i, t in enumerate(targets):
        g = min(len(t["boxes"]), g_max)
        out["boxes"][i, :g] = t["boxes"][:g]
        out["labels"][i, :g] = t["labels"][:g]
        out["valid"][i, :g] = True
        out["pair_ids"][i, :g] = t["pair_ids"][:g]
        out["styles"][i, :g] = t["styles"][:g]
        out["source"][i] = int(t["sources"][0]) if len(t["sources"]) else 0
        out["mask_crops"][i, :g] = t["mask_crops"][:g]
    return out


def train_one_epoch_matchrcnn(
    model,
    state,
    step_fn,
    data: Iterable[Tuple[List[np.ndarray], List[Dict], List[int]]],
    epoch: int,
    rng: jax.Array,
    print_freq: int = 100,
    writer: Optional[ScalarWriter] = None,
    g_max: int = 24,
    steps_per_epoch: Optional[int] = None,
    start_step: int = 0,
    save_every_steps: int = 0,
    save_fn=None,
):
    """Phase-1 loop.  ``data`` yields (images, targets, ids) batches.

    Mid-epoch checkpointing (no reference equivalent): every
    ``save_every_steps`` batches, ``save_fn(state, rng, step_in_epoch)``
    is called with the post-update state and the post-split rng — resuming
    with that rng and the remaining batches reproduces the uninterrupted
    run exactly (tests/test_mid_epoch_resume.py).  ``start_step`` offsets
    the step counter when the caller has already skipped that many
    batches.

    Mixed-orientation batches are split per canvas bucket (the
    static-canvas analogue of torchvision's dynamic batch padding).
    ``step_fn`` forms:
      * ``steps.Phase1Trainer`` (production): ONE update per batch with
        EXACT fused semantics — batch-spanning loss normalizers and
        cross-bucket street-shop match pairs (see Phase1Trainer docstring);
      * (grad, accum, apply) triple from ``make_phase1_grad_apply``:
        bucket gradients accumulated weighted by bucket fraction — one
        update per batch, but per-bucket normalizers and no cross-bucket
        match pairs (kept for tests/ablation);
      * plain callable: a full update per bucket (legacy, exact only for
        single-orientation batches).
    """
    linked = isinstance(step_fn, Phase1Trainer)
    accumulate = isinstance(step_fn, tuple)
    if accumulate:
        grad_fn, accum_fn, apply_fn = step_fn
    logger = MetricLogger()
    count = start_step
    for images, targets, ids in logger.log_every(data, print_freq,
                                                 f"Epoch: [{epoch}]",
                                                 total=steps_per_epoch):
        acc = None
        stats = None
        lf: Dict[str, float] = {}
        n_total = len(images)
        bucket_batches, bucket_rngs = [], []
        for bucket in batch_images(images, model.cfg.transform):
            bt = [targets[i] for i in bucket.indices]
            # empty targets still carry (0, c, c) (data/df2.py), so the
            # last dim is always the true crop size — no fallback constant
            # (a hardcoded 56 would break non-default mask_crop_size and
            # force a spurious recompile on all-empty buckets)
            crop = bt[0]["mask_crops"].shape[-1]
            gt = pad_targets(bt, g_max, crop)
            batch = {
                "images": jnp.asarray(bucket.pixels),
                "sizes": jnp.asarray(bucket.sizes),
                "gt": jax.tree.map(jnp.asarray, gt),
            }
            rng, sub = jax.random.split(rng)
            if linked:
                bucket_batches.append(batch)
                bucket_rngs.append(sub)
            elif accumulate:
                w = len(bucket.indices) / n_total
                # chain BN running stats through the buckets (the reference
                # sees the whole batch in one forward; sequential EMA updates
                # are the closest static-canvas equivalent)
                cur = state._replace(batch_stats=stats) if stats is not None else state
                grads, losses, stats = grad_fn(cur, batch, sub, jnp.float32(w))
                acc = grads if acc is None else accum_fn(acc, grads)
                for k, v in losses.items():
                    lf[k] = lf.get(k, 0.0) + w * float(v)
            else:
                state, losses = step_fn(state, batch, sub)
                lf = {k: float(v) for k, v in losses.items()}
                _check_finite(lf, f"epoch {epoch} step {count} ids {ids}")
                logger.update(**lf)
        if linked and bucket_batches:
            state, losses = step_fn.step(state, bucket_batches, bucket_rngs)
            lf = {k: float(v) for k, v in losses.items()}
            _check_finite(lf, f"epoch {epoch} step {count} ids {ids}")
            logger.update(**lf)
        if accumulate and acc is not None:
            state = apply_fn(state, acc, stats)
            _check_finite(lf, f"epoch {epoch} step {count} ids {ids}")
            logger.update(**lf)
        if writer is not None and count % print_freq == 0 and lf:
            for k, v in lf.items():
                writer.add_scalar(k, v, global_step=int(state.step))
        if save_fn is not None and save_every_steps > 0 \
                and (count + 1) % save_every_steps == 0:
            save_fn(state, rng, count)
        count += 1
    return state, rng


def _mf_batch_to_images(items: List[Dict]) -> Tuple[List[np.ndarray], List[int], List[int]]:
    images = [it["image"] for it in items]
    tags = [int(it["tag"]) for it in items]
    prods = [int(it["i"]) for it in items]
    # product ids within batch -> dense 0..P-1
    uniq = {p: n for n, p in enumerate(dict.fromkeys(prods))}
    return images, tags, [uniq[p] for p in prods]


def train_one_epoch_movingfashion(
    model,
    variables,
    head_state,
    head_step,
    runner,
    data: Iterable[List[Dict]],
    epoch: int,
    n_products: int,
    frames_per_product: int,
    score_thresh: float = 0.7,
    max_rows: int = 256,
    print_freq: int = 20,
    writer: Optional[ScalarWriter] = None,
    start_step: int = 0,
    save_every_steps: int = 0,
    save_fn=None,
):
    """Phase-2 SEAM loop (engine.py:76-199).  ``runner`` is an
    InferenceRunner built over the CURRENT variables with roi_features
    export; the frozen detector never changes during the epoch.

    ``save_fn(head_state, step_in_epoch)`` fires every ``save_every_steps``
    batches for preemption-safe mid-epoch resume (pair with the sampler's
    ``skip_batches`` and ``start_step``; no reference equivalent)."""
    logger = MetricLogger()
    count = start_step
    for items in logger.log_every(data, print_freq, f"Epoch: [{epoch}]"):
        images, tags, prods = _mf_batch_to_images(items)
        outs, dev = runner.run(images, device_keys=("roi_features",))
        sel = seam_mod.select_rows_host(
            outs, tags, prods, score_thresh, n_products, frames_per_product,
            max_rows,
        )
        if sel is None:
            # count consumed batches even without an optimizer step so a
            # mid-epoch resume's skip_batches stays aligned with the sampler
            count += 1
            continue
        batch = {
            "roi_src": dev["roi_features"],
            "row_img": jnp.asarray(sel.row_img),
            "row_det": jnp.asarray(sel.row_det),
            "valid": jnp.asarray(sel.valid),
            "types": jnp.asarray(sel.types),
            "prod": jnp.asarray(sel.prod),
            "img_slot": jnp.asarray(sel.img_slot),
            "shop_row": jnp.asarray(sel.shop_row),
            # weight_aggr = min(epoch / 1, 1.0) (engine.py:162)
            "aggr_weight": jnp.asarray(min(float(epoch), 1.0), jnp.float32),
        }
        head_state, losses = head_step(head_state, batch)
        lf = {k: float(v) for k, v in losses.items()}
        _check_finite(lf, f"epoch {epoch} step {count}")
        logger.update(**lf)
        if writer is not None and count % print_freq == 0:
            for k, v in lf.items():
                writer.add_scalar(k, v, global_step=int(head_state.step))
        if save_fn is not None and save_every_steps > 0 \
                and (count + 1) % save_every_steps == 0:
            save_fn(head_state, count)
        count += 1
    return head_state


def _best_iou_rows_mdf2(
    outs: List[Dict[str, np.ndarray]],
    items: List[Dict],
    prods: List[int],
    score_thresh: float,
    n_products: int,
    frames_per_product: int,
    max_rows: int,
):
    """MultiDF2 host selection (engine.py:258-295): within each image the
    detection best overlapping the product's GT box represents the product;
    shop images keep only that box; products whose shop has no detection are
    excluded."""
    from ..ops.rle import box_iou_xywh

    rows = []  # (img, det, tag, prod)
    excluded = set()
    seq_rows: Dict[int, List[int]] = {p: [] for p in range(n_products)}
    shop_row = np.full((n_products,), -1, np.int32)

    for i, (o, it, p) in enumerate(zip(outs, items, prods)):
        if p in excluded:
            continue
        keep = np.nonzero((o["scores"] >= score_thresh) & o["valid"])[0]
        if keep.size < 1:
            if it["tag"] == 1:
                excluded.add(p)
            continue
        style, pair_id = [int(x) for x in it["key"].split("_")]
        gmask = (np.asarray(it["styles"]) == style) & (np.asarray(it["pair_ids"]) == pair_id)
        if not gmask.any():
            continue
        gt_box = np.asarray(it["boxes"])[gmask][:1]
        pb = o["boxes"][keep]
        pb_xywh = np.concatenate([pb[:, :2], pb[:, 2:] - pb[:, :2]], 1)
        gt_xywh = np.concatenate([gt_box[:, :2], gt_box[:, 2:] - gt_box[:, :2]], 1)
        best = keep[int(np.argmax(box_iou_xywh(gt_xywh, pb_xywh)[0]))]
        r = len(rows)
        if r >= max_rows:
            break
        rows.append((i, int(best), it["tag"], p))
        if it["tag"] == 1:
            if shop_row[p] < 0:
                shop_row[p] = r
        else:
            seq_rows[p].append(r)

    # Drop rows of excluded products and REMAP the recorded row indices
    # (seq_rows / shop_row hold pre-filter positions).  With the in-repo
    # sampler a product's shop precedes its street frames, so exclusion
    # always happens before any of its rows are appended and the filter is
    # a no-op — but the function must not depend on batch item order.
    remap: Dict[int, int] = {}
    kept = []
    for old, x in enumerate(rows):
        if x[3] not in excluded:
            remap[old] = len(kept)
            kept.append(x)
    rows = kept
    if len(rows) < 2:
        return None
    k = max_rows
    row_img = np.zeros((k,), np.int32)
    row_det = np.zeros((k,), np.int32)
    for r, (img, det, _, _) in enumerate(rows):
        row_img[r] = img
        row_det[r] = det
    t = frames_per_product
    seq_gather = np.zeros((n_products, t), np.int32)
    seq_mask = np.zeros((n_products, t), bool)
    for p, rws in seq_rows.items():
        if p in excluded:
            continue
        for j, r in enumerate(rws[:t]):
            seq_gather[p, j] = remap[r]
            seq_mask[p, j] = True
    for p in range(n_products):
        if shop_row[p] >= 0 and p not in excluded:
            shop_row[p] = remap[int(shop_row[p])]
    for p in excluded:
        shop_row[p] = -1
        seq_mask[p] = False
    return {
        "row_img": row_img,
        "row_det": row_det,
        "shop_row": shop_row,
        "seq_gather": seq_gather,
        "seq_mask": seq_mask,
    }


def train_one_epoch_multidf2(
    model,
    variables,
    head_state,
    head_step,
    runner,
    data: Iterable[List[Dict]],
    epoch: int,
    n_products: int,
    frames_per_product: int,
    score_thresh: float = 0.7,
    max_rows: int = 256,
    print_freq: int = 20,
    writer: Optional[ScalarWriter] = None,
    start_step: int = 0,
    save_every_steps: int = 0,
    save_fn=None,
):
    logger = MetricLogger()
    count = start_step
    for items in logger.log_every(data, print_freq, f"Epoch: [{epoch}]"):
        images, tags, prods = _mf_batch_to_images(items)
        outs, dev = runner.run(images, device_keys=("roi_features",))
        sel = _best_iou_rows_mdf2(
            outs, items, prods, score_thresh, n_products, frames_per_product,
            max_rows,
        )
        if sel is None:
            # count consumed batches even without an optimizer step so a
            # mid-epoch resume's skip_batches stays aligned with the sampler
            count += 1
            continue
        batch = jax.tree.map(jnp.asarray, sel)
        batch["roi_src"] = dev["roi_features"]
        head_state, losses = head_step(head_state, batch)
        lf = {k: float(v) for k, v in losses.items()}
        _check_finite(lf, f"epoch {epoch} step {count}")
        logger.update(**lf)
        if writer is not None and count % print_freq == 0:
            for k, v in lf.items():
                writer.add_scalar(k, v, global_step=int(head_state.step))
        if save_fn is not None and save_every_steps > 0 \
                and (count + 1) % save_every_steps == 0:
            save_fn(head_state, count)
        count += 1
    return head_state
