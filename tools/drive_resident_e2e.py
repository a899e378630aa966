"""Compiled end-to-end parity: pallas_resident model backend vs exact XLA.

Runs the full VideoMatchRCNN inference (reference serving path,
/root/reference/models/video_matchrcnn.py:207-316) twice on the real TPU —
once with the exact XLA RoIAlign, once with roi_align_backend=
"pallas_resident" — and rank-aligns scores/boxes/match descriptors.  This
exercises the model wiring the kernel-level `-m tpu` tests can't: the
box-branch sorted fast path (head on tile-sorted features + logits/deltas
unpermute) and the generic gather-unpermute on mask/match RoI.

Small canvas (256x320) keeps the uncached remote compile to ~minutes.

Usage: python tools/drive_resident_e2e.py
"""

import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.config import (
        ModelConfig, RPNConfig, RoIHeadsConfig,
    )
    from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model

    print("backend:", jax.default_backend(), flush=True)
    kw = dict(rpn=RPNConfig(pre_nms_top_n_test=200, post_nms_top_n_test=256),
              compute_dtype="float32")
    cfg_x = ModelConfig(roi_heads=RoIHeadsConfig(detections_per_img=10), **kw)
    cfg_r = ModelConfig(roi_heads=RoIHeadsConfig(
        detections_per_img=10, roi_align_backend="pallas_resident"), **kw)
    model_x, variables = init_model(cfg_x, video=True, canvas=(256, 320))
    model_r = MatchRCNN(cfg=cfg_r, video=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 256, 320, 3).astype(np.float32))
    sizes = jnp.asarray([[256, 320], [240, 300]], jnp.int32)

    fx = jax.jit(lambda v, im, sz: model_x.apply(
        v, im, sz, method=MatchRCNN.inference))
    fr = jax.jit(lambda v, im, sz: model_r.apply(
        v, im, sz, method=MatchRCNN.inference))
    ox = jax.device_get(fx(variables, images, sizes))
    print("xla done", flush=True)
    orr = jax.device_get(fr(variables, images, sizes))
    print("resident done", flush=True)

    sx = np.sort(np.asarray(ox["scores"]), axis=-1)
    sr = np.sort(np.asarray(orr["scores"]), axis=-1)
    print("max rank-aligned score diff:", np.abs(sx - sr).max())
    bx = np.asarray(ox["boxes"])
    br = np.asarray(orr["boxes"])
    err = 0.0
    mfe = 0.0
    mx = np.asarray(ox["match_features"])
    mr = np.asarray(orr["match_features"])
    for i in range(bx.shape[0]):
        o1 = np.argsort(-np.asarray(ox["scores"])[i])
        o2 = np.argsort(-np.asarray(orr["scores"])[i])
        v = np.asarray(ox["valid"])[i][o1]
        if v.any():
            err = max(err, np.abs(bx[i][o1][v] - br[i][o2][v]).max())
            mfe = max(mfe, np.abs(mx[i][o1][v] - mr[i][o2][v]).max())
    print("max rank-aligned box diff:", err)
    print("max rank-aligned match_features diff:", mfe)
    # Thresholds are calibrated for TPU default matmul precision: even at
    # compute_dtype=float32, TPU matmuls run bf16 passes (DEFAULT
    # precision), so the two backends' differently-ordered matmul chains
    # carry ~1e-3-level feature rounding that box decode amplifies by the
    # box size (~100s px -> ~0.05 px).  CPU (true f32) measures score
    # diff 6.6e-7 / box diff 6e-5 on identical inputs (2026-08-18);
    # first compiled-TPU run measured 9.3e-4 / 0.051 / 4.0e-3.
    assert np.abs(sx - sr).max() < 3e-3, "scores diverge"
    assert err < 0.25, "boxes diverge"
    assert mfe < 2e-2, "descriptors diverge"
    print("OK: pallas_resident backend matches exact on compiled TPU")


if __name__ == "__main__":
    main()
