"""Shared synthetic-data training flow for the profile validators.

Trains phase-1 Match R-CNN on a synthetic DeepFashion2 fixture at REAL
geometry (min side 800) and warm-starts the video model from it — the
reference ``load_saved_matchrcnn`` flow (/root/reference/
train_movingfashion.py:64-77).  Used by tools/validate_fast_profile.py and
tools/validate_int8.py so the two gates train the SAME model once each and
only vary the serving knob under test.
"""

import os
import tempfile

import numpy as np


def train_synthetic_phase1(products, epochs, batch, lr, palette_colors=None):
    """Train on a fresh synthetic DF2 fixture; returns (trained_variables,
    palette, root_dir).  palette_colors: reuse an existing palette (the
    synthetic family's retrieval signal is color identity — eval products
    must share the train palette)."""
    import jax
    import jax.numpy as jnp  # noqa: F401  (forces backend init before flax)
    import optax

    from seam_match_rcnn_tpu.config import ModelConfig
    from seam_match_rcnn_tpu.data import convert as conv
    from seam_match_rcnn_tpu.data.df2 import (DF2PairBatchSampler,
                                              DeepFashion2Dataset)
    from seam_match_rcnn_tpu.data.synthetic import make_synthetic_df2
    from seam_match_rcnn_tpu.data.transforms import Compose, ToArray
    from seam_match_rcnn_tpu.models.matchrcnn import init_model
    from seam_match_rcnn_tpu.train.engine import train_one_epoch_matchrcnn
    from seam_match_rcnn_tpu.train.optim import (multistep_warmup_schedule,
                                                 sgd)
    from seam_match_rcnn_tpu.train.steps import (create_train_state,
                                                 make_phase1_grad_apply)

    root = tempfile.mkdtemp(prefix="synthval_")
    palette = palette_colors or [
        list(map(int, c))
        for c in np.random.RandomState(42).randint(64, 255, (products, 3))
    ]
    img_dir, ann_dir = make_synthetic_df2(
        os.path.join(root, "df2"), n_products=products, views_per_side=2,
        image_size=(160, 200), colors=palette)
    ann = os.path.join(root, "df2", "annots.json")
    conv.convert(img_dir, ann_dir, ann)

    # f32 compute: from-scratch training in bf16 at this scale NaNs once
    # warmup ends (see validate_fast_profile.py round-2 notes)
    cfg = ModelConfig(compute_dtype="float32")
    model, variables = init_model(
        cfg, video=False, canvas=cfg.transform.landscape_canvas)
    ds = DeepFashion2Dataset(ann, img_dir, transforms=Compose([ToArray()]))
    sampler = DF2PairBatchSampler(ds, batch, seed=0)
    steps = max(len(sampler), 1)
    # From-scratch full-geometry Mask R-CNN without an ImageNet backbone
    # diverges through the mask branch (the reference always warm-starts);
    # the tools only need a working detector, so clip gradients — a tool
    # choice, not a training-recipe parity claim.
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        sgd(multistep_warmup_schedule(
            lr, (max(epochs - 2, 1),), 0.1, steps,
            min(60, steps * (epochs - 1)), 1e-2), momentum=0.9))
    state = create_train_state(variables, tx)
    triple = make_phase1_grad_apply(model, tx)
    rng = jax.random.PRNGKey(0)

    def batches(epoch):
        sampler.set_epoch(epoch)
        for idxs in sampler:
            items = [ds[i] for i in idxs]
            yield ([i[0] for i in items], [i[1] for i in items],
                   [i[2] for i in items])

    for ep in range(epochs):
        state, rng = train_one_epoch_matchrcnn(
            model, state, triple, batches(ep), ep, rng, print_freq=4)
    trained = {"params": state.params, "batch_stats": state.batch_stats}
    return trained, palette, root


def video_vars(vcfg, trained):
    """Warm-start VideoMatchRCNN variables from trained phase-1 variables
    (reference load_saved_matchrcnn + clone_section semantics)."""
    from seam_match_rcnn_tpu.models.matchrcnn import init_model

    _, base = init_model(vcfg, video=True,
                         canvas=vcfg.transform.landscape_canvas)
    params = dict(base["params"])
    stats = dict(base["batch_stats"])
    params.update({k: v for k, v in trained["params"].items()})
    stats.update({k: v for k, v in trained["batch_stats"].items()})
    ta = dict(params["temporal_aggregator"])
    ta["trunk"] = trained["params"]["match_predictor"]["trunk"]
    ta["last"] = trained["params"]["match_predictor"]["last"]
    params["temporal_aggregator"] = ta
    stats["temporal_aggregator"] = trained["batch_stats"]["match_predictor"]
    return {"params": params, "batch_stats": stats}


def all_strategy_top1(out_dir):
    """Read the eval harness's metrics.json: {strategy: top1} for every
    strategy it records (the 7 MF strategies or the MDF2 family)."""
    import json

    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    table = metrics["all"] if "all" in metrics else metrics
    out = {}
    for strat, per_k in table.items():
        if isinstance(per_k, dict):
            ks = sorted(int(k) for k in per_k)
            out[strat] = float(per_k[str(ks[0])])
    return out


def descriptor_probe(vmodel, vv, images):
    """Backend-drift probe at sub-quantum resolution (PERF.md round 4: the
    top-1 gates resolve only ±1-2 product flips, so backends whose drift
    is far below the decision boundaries still show nonzero top-1 deltas
    from rounding noise).  Runs the serving forward on a FIXED probe image
    list and returns the per-detection match descriptors + scores as flat
    arrays; compare_probes() turns two backends' outputs into drift stats.

    images: list of HWC float arrays (identical across backends).
    """
    import numpy as np

    from seam_match_rcnn_tpu.eval.runner import InferenceRunner

    runner = InferenceRunner(vmodel, vv, chunk=4, with_match=True,
                             with_aggr_features=False)
    results = runner(images)
    desc = np.concatenate([r["match_features"] for r in results], 0)
    scores = np.concatenate([r["scores"] for r in results], 0)
    valid = np.concatenate([r["valid"] for r in results], 0).astype(bool)
    return {"desc": desc[valid], "scores": scores[valid]}


def confusable_palette(products, seed=42, delta=40):
    """Near-pair palette: products come in pairs whose colors differ by
    ``delta`` per channel — the "harder confusable-garment mix" of VERDICT
    r4 #2.  Distinguishing siblings forces small retrieval margins, so
    backend rounding that damages ranks becomes visible instead of hiding
    inside saturated top-1 tables.

    delta calibration (measured 2026-08-21): 18 (below the fixture's 0-20
    pixel noise) collapses the synthetic-trained model to top-1 == 0 on
    every strategy at 64 products — an instrument with no signal; 40 keeps
    sibling pairs the hardest discrimination while staying learnable."""
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.randint(64, 255 - delta, ((products + 1) // 2, 3))
    sib = np.clip(base + rng.choice([-delta, delta], base.shape), 0, 255)
    palette = np.empty((base.shape[0] * 2, 3), np.int64)
    palette[0::2] = base
    palette[1::2] = sib
    return [list(map(int, c)) for c in palette[:products]]


def rank_margin_probe(vmodel, vv, products):
    """Sub-quantum RANK instrument (VERDICT r4 weak #1: descriptor drift
    alone measures rounding, not rank damage).  Runs the serving forward
    over the full product fixture, builds the street->shop avg-descriptor
    gallery score matrix, and returns per-product retrieval ranks AND the
    top1-vs-runner-up score margins.  Comparing two backends' outputs
    through ``margin_analysis`` separates rounding flips (margin below the
    control backends' own score drift) from real rank damage (flips at
    margins the drift cannot explain).  Scoring chain mirrored:
    /root/reference/evaluate_movingfashion.py:94-121 (match descriptors ->
    pairwise logits -> argsort)."""
    import numpy as np

    from seam_match_rcnn_tpu.eval.gallery import score_matrix
    from seam_match_rcnn_tpu.eval.runner import InferenceRunner

    runner = InferenceRunner(vmodel, vv, chunk=8, with_match=True,
                             with_aggr_features=False)
    p = vv["params"]["match_predictor"]["last"]
    w = np.asarray(p["kernel"]).T
    b = np.asarray(p["bias"])
    shop, street = [], []
    for prod in products:
        outs = runner(prod["images"])
        s = outs[0]
        keep = np.nonzero(s["valid"])[0]
        if keep.size == 0:
            shop.append(None)
            street.append(None)
            continue
        areas = (s["boxes"][keep, 2] - s["boxes"][keep, 0]) * (
            s["boxes"][keep, 3] - s["boxes"][keep, 1])
        shop.append(s["match_features"][keep[int(np.argmax(areas))]])
        descs = []
        for o in outs[1:]:
            k2 = np.nonzero(o["valid"])[0]
            if k2.size:
                descs.append(
                    o["match_features"][k2[int(np.argmax(o["scores"][k2]))]])
        street.append(np.mean(descs, 0) if descs else None)
    kept = [i for i in range(len(shop))
            if shop[i] is not None and street[i] is not None]
    if len(kept) < 2:
        return {"kept": kept}
    scores = np.asarray(score_matrix(
        np.stack([street[i] for i in kept]),
        np.stack([shop[i] for i in kept]), w, b))
    n = len(kept)
    ranks = np.empty((n,), np.int64)
    margins = np.empty((n,), np.float64)
    for r in range(n):
        row = scores[r]
        ranks[r] = int(np.sum(row > row[r]))  # rank of the true product
        others = np.delete(row, r)
        margins[r] = float(row[r] - np.max(others))
    return {"scores": scores, "ranks": ranks, "margins": margins,
            "kept": kept}


def margin_analysis(base, other):
    """Classify top-1 flips between two rank_margin_probe outputs.
    ``score_drift_max`` between a CONTROL pair of backends sets the noise
    bound; a flip whose |base margin| exceeds that bound is real rank
    damage, not rounding."""
    import numpy as np

    if base.get("kept") != other.get("kept") or "ranks" not in base:
        return {"detection_sets_diverged": True,
                "kept_base": len(base.get("kept", [])),
                "kept_other": len(other.get("kept", []))}
    flips = [i for i in range(len(base["ranks"]))
             if (base["ranks"][i] == 0) != (other["ranks"][i] == 0)]
    return {
        "score_drift_max": float(np.abs(base["scores"] -
                                        other["scores"]).max()),
        "top1_base": float((base["ranks"] == 0).mean()),
        "top1_other": float((other["ranks"] == 0).mean()),
        "n_products": int(len(base["ranks"])),
        "n_flips": len(flips),
        "flip_margins_base": [float(base["margins"][i]) for i in flips],
        "margin_min_abs": float(np.abs(base["margins"]).min()),
        "margin_median_abs": float(np.median(np.abs(base["margins"]))),
    }


def compare_probes(a, b):
    """Drift stats between two descriptor_probe() outputs (same probe set,
    same detection slots — valid-count mismatch means detection sets
    diverged, reported rather than crashed)."""
    import numpy as np

    if a["desc"].shape != b["desc"].shape:
        return {"detection_sets_diverged": True,
                "n_a": int(a["desc"].shape[0]), "n_b": int(b["desc"].shape[0])}
    dd = np.abs(a["desc"] - b["desc"])
    ds = np.abs(a["scores"] - b["scores"])
    # pairwise self-score matrix drift: how much the (street x shop)-style
    # score surface the eval ranks on moves between backends
    return {
        "desc_max_abs": float(dd.max()) if dd.size else 0.0,
        "desc_mean_abs": float(dd.mean()) if dd.size else 0.0,
        "score_max_abs": float(ds.max()) if ds.size else 0.0,
        "n_detections": int(a["desc"].shape[0]),
    }
