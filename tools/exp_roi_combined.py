"""Experiment: RoIAlign kernel variants (see PERF.md lever 5).

Variants measured at the serving geometry (11 x 4000 rois, 7x7, 256ch bf16):
  NOTE: production (ops/pallas_roi_align.py) has since adopted the
  combined matmul + footprint-gated row DMA; the variants here rebuild
  the historical forms for A/B measurement.
  separable   two matmuls, M=7 (the original kernel)
  dma_floor   patch DMA + trivial slice-store only — the DMA/issue floor;
              if this ~= separable, matmul restructuring cannot help
  combined    ONE matmul [49, 1920] @ [1920, C] with the Kronecker pooling
              operator built via sublane/lane repeat + concat (no reshapes,
              which Mosaic cannot shape-cast); 5.6x FLOPs, 7x M-rows/tile
  sep_noswap  separable without the final [7,7,C] swapaxes (timing only,
              output transposed) — isolates the per-roi relayout cost

Usage: python tools/exp_roi_combined.py [--batch 11] [--rois 4000]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--rois", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--variants", default="separable,dma_floor,combined,sep_noswap")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.ops import pallas_roi_align as pra

    PATCH, PATCH_W = pra.PATCH, pra.PATCH_W

    def _compute_combined(geom_ref, patch, k, output_size, sampling_ratio):
        o = output_size
        c = patch.shape[-1]
        wy = pra._interp_matrix(geom_ref[k, 0], geom_ref[k, 2],
                                geom_ref[k, 4], geom_ref[k, 5],
                                o, sampling_ratio, PATCH)
        wx = pra._interp_matrix(geom_ref[k, 1], geom_ref[k, 3],
                                geom_ref[k, 6], geom_ref[k, 7],
                                o, sampling_ratio, PATCH_W)
        # Kronecker expansion without reshapes (Mosaic cannot shape-cast the
        # 4D outer product) and without pltpu.repeat (tile-like semantics):
        #   wc[(oy,ox),(py,px)] = wy[oy,py] * wx[ox,px]
        # rows: wyR = interleaved row-repeat of wy; wxR = row-tile of wx
        wyR = jnp.concatenate(
            [jnp.broadcast_to(wy[i:i + 1], (o, PATCH)) for i in range(o)], 0)
        wxR = jnp.concatenate([wx] * o, axis=0)     # [49, PATCH_W]
        # cols: py-major blocks of 48 = wyR[:, py] * wx row
        wc = jnp.concatenate(
            [wyR[:, py:py + 1] * wxR for py in range(PATCH)], axis=1)
        pf = patch[k][:].reshape(PATCH * PATCH_W, c)
        if jnp.dtype(patch.dtype) == jnp.float32:
            prec = jax.lax.Precision.HIGHEST
        else:
            pf = pf.astype(jnp.bfloat16)
            wc = wc.astype(jnp.bfloat16)
            prec = None
        pooled = jax.lax.dot_general(
            wc, pf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )                                           # [49, c]
        return pooled.reshape(o, o, c)

    def _compute_separable(geom_ref, patch, k, output_size, sampling_ratio,
                           swap):
        o = output_size
        c = patch.shape[-1]
        wy = pra._interp_matrix(geom_ref[k, 0], geom_ref[k, 2],
                                geom_ref[k, 4], geom_ref[k, 5],
                                o, sampling_ratio, PATCH)
        wx = pra._interp_matrix(geom_ref[k, 1], geom_ref[k, 3],
                                geom_ref[k, 6], geom_ref[k, 7],
                                o, sampling_ratio, PATCH_W)
        if jnp.dtype(patch.dtype) == jnp.float32:
            pf, wyc, prec = patch[k][:], wy, jax.lax.Precision.HIGHEST
        else:
            pf = patch[k][:].astype(jnp.bfloat16)
            wyc, prec = wy.astype(jnp.bfloat16), None
        tmp = jax.lax.dot_general(
            wyc, pf.reshape(PATCH, PATCH_W * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).reshape(o, PATCH_W, c)
        pooled = jax.lax.dot_general(
            wx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return jnp.swapaxes(pooled, 0, 1) if swap else pooled

    def make_kernel(variant, output_size, sampling_ratio, mini):
        def kern(img_ref, lvl_ref, y0_ref, x0_ref, geom_ref,
                 f0, f1, f2, f3, out_ref, patch, sem):
            i = pl.program_id(0)
            refs = (f0, f1, f2, f3)
            for k in range(mini):
                j = i * mini + k
                img = img_ref[j]
                lvl = lvl_ref[j]
                y0 = y0_ref[j]
                x0 = pl.multiple_of(x0_ref[j], 8)
                for lv, f in enumerate(refs):
                    @pl.when(lvl == lv)
                    def _():
                        pltpu.make_async_copy(
                            f.at[img, pl.ds(y0, PATCH), pl.ds(x0, PATCH_W), :],
                            patch.at[k], sem.at[k],
                        ).start()
            o = output_size
            c = patch.shape[-1]
            for k in range(mini):
                pltpu.make_async_copy(
                    f0.at[0, pl.ds(0, PATCH), pl.ds(0, PATCH_W), :],
                    patch.at[k], sem.at[k],
                ).wait()
                if variant.startswith("dma_floor"):
                    out_ref[k] = patch[k][:o, :o, :].astype(jnp.float32)
                elif variant == "combined":
                    out_ref[k] = _compute_combined(
                        geom_ref, patch, k, o, sampling_ratio)
                elif variant == "sep_noswap":
                    out_ref[k] = _compute_separable(
                        geom_ref, patch, k, o, sampling_ratio, swap=False)
                else:
                    out_ref[k] = _compute_separable(
                        geom_ref, patch, k, o, sampling_ratio, swap=True)
        return kern

    @functools.partial(jax.jit,
                       static_argnames=("variant", "output_size",
                                        "sampling_ratio"))
    def variant_roi_align(features, rois, variant, output_size,
                          sampling_ratio=2):
        spatial_scales = (0.25, 0.125, 0.0625, 0.03125)
        b, r = rois.shape[:2]
        c = features[0].shape[-1]
        level_shapes = tuple((f.shape[1], f.shape[2]) for f in features)
        padded = [jnp.pad(f, ((0, 0), (1, PATCH), (1, PATCH_W), (0, 0)))
                  for f in features]
        flat_rois = rois.reshape(b * r, 4)
        img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        lvl, y0, x0, _nrows, fgeom = pra._prep_scalars(
            flat_rois, level_shapes, spatial_scales, output_size)
        n = b * r
        roi_chunk = pra.ROI_CHUNK
        pad = (-n) % roi_chunk
        if pad:
            img_idx = jnp.pad(img_idx, (0, pad))
            lvl = jnp.pad(lvl, (0, pad))
            y0 = jnp.pad(y0, (0, pad))
            x0 = jnp.pad(x0, (0, pad))
            fgeom = jnp.pad(fgeom, ((0, pad), (0, 0)))
        mini = pra._pick_mini(c, jnp.dtype(padded[0].dtype).itemsize)
        kernel = make_kernel(variant, output_size, sampling_ratio, mini)
        n_groups = (n + pad) // mini
        fgeom = fgeom.reshape(n_groups, mini, 8)
        if mini < 8:
            fgeom = jnp.pad(fgeom, ((0, 0), (0, 8 - mini), (0, 0)))
        fgeom = fgeom.reshape(n_groups * 8, 8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(roi_chunk // mini,),
            in_specs=[pl.BlockSpec((8, 8), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=pl.BlockSpec(
                (mini, output_size, output_size, c), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((mini, PATCH, PATCH_W, c), padded[0].dtype),
                pltpu.SemaphoreType.DMA((mini,)),
            ],
        )
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (roi_chunk, output_size, output_size, c), jnp.float32),
            grid_spec=grid_spec,
            interpret=jax.default_backend() != "tpu",
        )
        n_chunks = (n + pad) // roi_chunk
        chunk = lambda a: a.reshape((n_chunks, roi_chunk) + a.shape[1:])
        geom_chunked = fgeom.reshape(n_chunks, (roi_chunk // mini) * 8, 8)

        def body(a):
            im, lv, yy, xx, geom = a
            return call(im, lv, yy, xx, geom, *padded)

        outs = jax.lax.map(
            body, (chunk(img_idx), chunk(lvl), chunk(y0), chunk(x0),
                   geom_chunked))
        out = outs.reshape(n + pad, output_size, output_size, c)[:n]
        return out.reshape(b, r, output_size, output_size, c)

    b, r, c = args.batch, args.rois, args.channels
    shapes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
             for h, w in shapes]
    side = np.exp(rng.uniform(np.log(30), np.log(250), size=(args.iters, b, r)))
    a = rng.uniform(0.55, 1.8, size=(args.iters, b, r))
    bw = np.minimum(side * np.sqrt(a), 1340.0)
    bh = np.minimum(side / np.sqrt(a), 798.0)
    x1 = rng.uniform(0, 1, size=bw.shape) * (1344 - bw)
    y1 = rng.uniform(0, 1, size=bw.shape) * (800 - bh)
    all_rois = jnp.asarray(
        np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32))

    def make_run(variant):
        int8 = variant.endswith("_int8")
        kvariant = variant[:-5] if int8 else variant

        def run(feats, rois_seq):
            if int8:
                feats, _ = pra.quantize_features_int8(feats)

            def body(acc, rois):
                out = variant_roi_align(feats, rois, kvariant, 7, 2)
                return acc + jnp.sum(out), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0), rois_seq)
            return tot
        return run

    for name in args.variants.split(","):
        try:
            f = jax.jit(make_run(name))
            float(f(feats, all_rois))
            t0 = time.perf_counter()
            float(f(feats, all_rois))
            dt = (time.perf_counter() - t0) / args.iters
            n = b * r
            print(f"{name:12s}: {dt*1e3:8.1f} ms / {n} rois  "
                  f"({dt/n*1e6:.2f} us/roi)", flush=True)
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:150]}", flush=True)

    if "combined" in args.variants:
        out_a = variant_roi_align(feats, all_rois[0], "separable", 7, 2)
        out_b = variant_roi_align(feats, all_rois[0], "combined", 7, 2)
        d = jnp.max(jnp.abs(out_a - out_b)) / (jnp.max(jnp.abs(out_a)) + 1e-9)
        print(f"max rel diff combined vs separable: {float(d):.6f}")


if __name__ == "__main__":
    main()
