"""Stage-by-stage PHASE-1 TRAINING profiler (VERDICT r4 #1).

The training analogue of tools/profile_serving.py: times cumulative
pipeline prefixes of the supervised step — forward-only AND full
forward+backward+SGD — so the backward milliseconds finally have an
address.  Stages follow the actual computation order of
``MatchRCNN._train_core`` (the reference step being replaced is
/root/reference/stuffs/engine.py:18-71):

  backbone   features() only
  rpn        + RPN head, proposal NMS, RPN loss
  sample     + proposal assignment/sampling (stop-gradient host of the
               box-branch targets)
  boxbranch  + 512-roi RoIAlign + box head + fastrcnn loss
  mask       + 128-roi 14x14 RoIAlign + mask head + mask loss
  full       + match-slot selection + match loss (= training_losses)
  opt        the SGD/momentum update alone (tx.update + apply on a full
             gradient tree)

Per stage the tool reports fwd ms, step ms (grad + update), and XLA's
analytic FLOPs over the compiled program divided by wall time (achieved
TFLOP/s) — the roofline column.  Defaults measure the PRODUCTION
configuration (frozen-mask optimizer; --freeze adds the stop-gradient
stem lever, --no-mask reverts to the historical unmasked bench tx).

Usage: python tools/profile_train.py [--batch 4] [--iters 4]
       [--stages backbone,rpn,...] [--fwd-only|--step-only]
Timing: scan-inside-one-jit over DISTINCT image batches + scalar fetch
(block_until_ready does not fence here — PERF.md).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

ALL_STAGES = ["backbone", "rpn", "sample", "boxbranch", "mask", "full"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--roi-backend", default="pallas_resident",
                    choices=["xla", "pallas", "pallas_resident"])
    ap.add_argument("--adjoint", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no-mask", action="store_true",
                    help="unmasked optimizer (historical bench tx); default "
                    "is the production backbone_frozen_mask")
    ap.add_argument("--freeze", action="store_true",
                    help="stop_gradient at the layer1/layer2 boundary "
                    "(config.freeze_backbone_stages)")
    ap.add_argument("--stages", default=None,
                    help="comma-separated subset of "
                    + ",".join(ALL_STAGES) + ",opt")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--step-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.config import ModelConfig, RoIHeadsConfig
    from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model
    from seam_match_rcnn_tpu.train.optim import (backbone_frozen_mask,
                                                 multistep_warmup_schedule,
                                                 sgd)
    from seam_match_rcnn_tpu.train.steps import TrainState, create_train_state

    cfg = ModelConfig(remat_backbone=args.remat,
                      freeze_backbone_stages=args.freeze,
                      roi_heads=RoIHeadsConfig(
                          roi_align_backend=args.roi_backend,
                          roi_adjoint_backend=args.adjoint))
    model, variables = init_model(cfg, video=False, canvas=(256, 320))
    tx = sgd(multistep_warmup_schedule(0.02, (6, 9), 0.1, 1000, 1000, 1e-3),
             momentum=0.9,
             trainable_mask=None if args.no_mask else backbone_frozen_mask)
    state = create_train_state(variables, tx)

    b, h, w, g = args.batch, args.height, args.width, 8
    rng = np.random.RandomState(0)
    # distinct image batches per scan iteration: loop-invariant stages
    # (e.g. the whole forward under fwd-only timing) must not be hoisted
    all_images = jnp.asarray(
        rng.rand(args.iters, b, h, w, 3).astype(np.float32))
    s = min(200, h // 2, w // 2)
    x1 = rng.uniform(0, w - s, (b, g))
    y1 = rng.uniform(0, h - s, (b, g))
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(s // 5, s, (b, g)),
         y1 + rng.uniform(s // 5, s, (b, g))], -1).astype(np.float32)
    sizes = jnp.asarray([[min(h, 1333), min(w, 1333)]] * b, jnp.int32)
    gt = {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(rng.randint(1, 14, (b, g))),
        "valid": jnp.ones((b, g), bool),
        "pair_ids": jnp.asarray(rng.randint(1, 5, (b, g))),
        "styles": jnp.ones((b, g), jnp.int32),
        "source": jnp.asarray([i % 2 for i in range(b)], jnp.int32),
        "mask_crops": jnp.asarray(
            (rng.rand(b, g, 56, 56) > 0.4).astype(np.uint8)),
    }
    seeds = jnp.arange(args.iters)

    def loss_apply(params, batch_stats, imgs, seed, stage):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, sizes, gt, jax.random.PRNGKey(seed), stage,
            method=MatchRCNN.profile_losses, mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    def timed(compiled, fargs):
        f0 = float(compiled(*fargs))  # warm (already compiled)
        assert np.isfinite(f0), f0
        t0 = time.perf_counter()
        float(compiled(*fargs))
        return (time.perf_counter() - t0) / args.iters * 1000.0

    def cost_tflops(compiled, ms):
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            fl = float(ca.get("flops", 0.0)) / args.iters
            return round(fl / (ms / 1000.0) / 1e12, 2) if fl > 0 else None
        except Exception:
            return None

    stages = args.stages.split(",") if args.stages else ALL_STAGES + ["opt"]
    unknown = sorted(set(stages) - set(ALL_STAGES + ["opt"]))
    if unknown:
        ap.error(f"unknown stages {unknown}")

    rows = []
    for stage in stages:
        row = {"stage": stage}
        if stage == "opt":
            # momentum+lr update alone, full-size gradient tree
            grads = jax.tree.map(jnp.ones_like, state.params)

            def opt_loop(st, seeds):
                def body(st, seed):
                    updates, opt_state = tx.update(
                        grads, st.opt_state, st.params)
                    params = optax.apply_updates(st.params, updates)
                    st = TrainState(params, st.batch_stats, opt_state,
                                    st.step + 1)
                    return st, jnp.float32(0)
                st, _ = jax.lax.scan(body, st, seeds)
                return jax.tree.leaves(st.params)[0].astype(jnp.float32).sum()

            c = jax.jit(opt_loop).lower(state, seeds).compile()
            row["step_ms"] = round(timed(c, (state, seeds)), 1)
            rows.append(row)
            print(f"opt: {row['step_ms']} ms", flush=True)
            continue

        if not args.step_only:
            def fwd_loop(params, batch_stats, all_images, seeds, stage=stage):
                def body(acc, xs):
                    imgs, seed = xs
                    out, _ = loss_apply(params, batch_stats, imgs, seed, stage)
                    return acc + out, ()
                tot, _ = jax.lax.scan(
                    body, jnp.float32(0), (all_images, seeds))
                return tot

            cf = jax.jit(fwd_loop).lower(
                state.params, state.batch_stats, all_images, seeds).compile()
            row["fwd_ms"] = round(
                timed(cf, (state.params, state.batch_stats, all_images,
                           seeds)), 1)
            tf = cost_tflops(cf, row["fwd_ms"])
            if tf is not None:
                row["fwd_tflops"] = tf
        if not args.fwd_only:
            def step_loop(state, all_images, seeds, stage=stage):
                def body(st, xs):
                    imgs, seed = xs
                    (tot, new_stats), grads = jax.value_and_grad(
                        lambda p, bs: loss_apply(p, bs, imgs, seed, stage),
                        has_aux=True)(st.params, st.batch_stats)
                    updates, opt_state = tx.update(
                        grads, st.opt_state, st.params)
                    params = optax.apply_updates(st.params, updates)
                    return TrainState(params, new_stats, opt_state,
                                      st.step + 1), tot
                st, tots = jax.lax.scan(body, state, (all_images, seeds))
                return jnp.sum(tots)

            cs = jax.jit(step_loop).lower(state, all_images, seeds).compile()
            row["step_ms"] = round(timed(cs, (state, all_images, seeds)), 1)
            ts = cost_tflops(cs, row["step_ms"])
            if ts is not None:
                row["step_tflops"] = ts
        rows.append(row)
        print(f"{stage}: " + " ".join(f"{k}={v}" for k, v in row.items()
                                      if k != "stage"), flush=True)

    print("PROFILE_TRAIN_JSON " + json.dumps({
        "geometry": [b, h, w],
        "iters": args.iters,
        "roi_backend": args.roi_backend,
        "adjoint": args.adjoint,
        "mask": not args.no_mask,
        "freeze": args.freeze,
        "remat": args.remat,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
