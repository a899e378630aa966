"""SEAM phase-2 head-step benchmark (the trainable part of
train_one_epoch_movingfashion, engine.py:120-198 equivalent).

Times the jitted head grad step over a realistic product batch:
(1 shop + 10 frames) x 16 products = 176 images, device-resident
[176, 100, 14, 14, 256] roi features, K=256 selected rows.

Usage: python tools/bench_seam.py [--iters 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n_products", type=int, default=16)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--dets", type=int, default=100)
    ap.add_argument("--rows", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.models.match_head import MatchPredictor, TemporalAggregator
    from seam_match_rcnn_tpu.train.optim import sgd
    from seam_match_rcnn_tpu.train.seam import create_head_state, make_seam_head_step

    p, t, d, k = args.n_products, args.frames, args.dets, args.rows
    n_img = p * (1 + t)

    rng = np.random.RandomState(0)
    roi_small = jnp.asarray(rng.randn(2, 14, 14, 256).astype(np.float32))
    mp = MatchPredictor()
    ta = TemporalAggregator()
    mp_v = mp.init(jax.random.PRNGKey(0), roi_small, jnp.asarray([0]), jnp.asarray([1]))
    ta_v = ta.init(jax.random.PRNGKey(1), roi_small, jnp.zeros((1, 2), jnp.int32),
                   jnp.ones((1, 2), bool), jnp.asarray([1]))
    variables = {
        "params": {"match_predictor": mp_v["params"], "temporal_aggregator": ta_v["params"]},
        "batch_stats": {"match_predictor": mp_v["batch_stats"],
                        "temporal_aggregator": ta_v["batch_stats"]},
    }
    tx = sgd(lambda s: 0.04, momentum=0.9, weight_decay=5e-4)
    state = create_head_state(variables, tx)
    step = make_seam_head_step(tx, frames_per_product=t, n_frames=3)

    # device-resident roi features (bf16 halves HBM; step casts to f32 rows)
    roi_src = jax.jit(
        lambda key: jax.random.normal(key, (n_img, d, 14, 14, 256), jnp.bfloat16)
    )(jax.random.PRNGKey(2))

    types = np.zeros(k, np.int32)
    prod = rng.randint(0, p, k).astype(np.int32)
    img_slot = np.zeros(k, np.int32)
    shop_row = np.arange(p, dtype=np.int32)
    for r in range(p, k):
        img_slot[r] = prod[r] * t + rng.randint(0, t)
    types[:p] = 1
    batch = {
        "roi_src": roi_src,
        "row_img": jnp.asarray(rng.randint(0, n_img, k).astype(np.int32)),
        "row_det": jnp.asarray(rng.randint(0, d, k).astype(np.int32)),
        "valid": jnp.ones(k, bool),
        "types": jnp.asarray(types),
        "prod": jnp.asarray(prod),
        "img_slot": jnp.asarray(img_slot),
        "shop_row": jnp.asarray(shop_row),
        "aggr_weight": jnp.asarray(1.0, jnp.float32),
    }

    def loop(state, batch, n):
        def body(st, _):
            st2, losses = step(st, batch)
            return st2, losses["loss"]
        st, losses = jax.lax.scan(body, state, jnp.arange(n))
        return st, jnp.sum(losses)

    jloop = jax.jit(loop, static_argnames=("n",))
    st, total = jloop(state, batch, args.iters)
    float(total)
    t0 = time.perf_counter()
    st, total = jloop(state, batch, args.iters)
    float(total)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "seam_head_step_time",
        "value": round(dt / args.iters * 1000, 2),
        "unit": "ms/step",
        "rows": k, "products": p, "frames": t,
    }))


if __name__ == "__main__":
    main()
