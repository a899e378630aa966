"""Experiment: Mosaic feasibility/cost of the fused conv1+maxpool stem.

The stem (7x7 s2 conv + BN + relu + 3x3 s2 maxpool) is streaming-bandwidth
bound in XLA (~11 ms/batch measured, PERF.md) because the 189 MB conv
activation round-trips HBM.  A fused Pallas kernel needs an in-VMEM im2col
from a space-to-depth input strip [20, 675*12] -> [17*672, 192], which
requires either a minor-dim reshape (lane split) or 16 lane-concats of
12-lane slices.  This tool measures which constructions Mosaic compiles and
what they cost per strip, before committing to the kernel.

Usage: python tools/exp_stem_im2col.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
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

    LANES = 8192   # 675*12 = 8100 padded
    ROWS = 24      # 20 rows padded to sublane multiple
    CONVR = 17     # conv rows per strip
    W2 = 672
    GRID = 275     # strips per batch-11 (25 per image)

    def run_case(name, kern, out_shape):
        x = jnp.asarray(
            np.random.RandomState(0).randn(ROWS, LANES), jnp.bfloat16)
        w = jnp.asarray(
            np.random.RandomState(1).randn(192, 64), jnp.bfloat16)
        try:
            f = pl.pallas_call(
                kern,
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((192, 64), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    out_shape, lambda i: tuple(0 for _ in out_shape),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )
            g = jax.jit(lambda x, w: jnp.sum(f(x, w)))
            float(g(x, w))
            t0 = time.perf_counter()
            float(g(x, w))
            dt = (time.perf_counter() - t0) / GRID
            print(f"{name}: {dt*1e6:8.2f} us/strip "
                  f"({dt*GRID*1e3:.2f} ms/batch-11)", flush=True)
        except Exception as e:
            lines = [l for l in str(e).splitlines()
                     if "Mosaic" in l or "must be" in l or "unsupported" in l]
            print(f"{name}: FAIL {(lines or [str(e)[:140]])[0][:150]}",
                  flush=True)

    # Case 1: minor-split reshape + one K=12 matmul per tap (16 taps)
    def k_reshape(x_ref, w_ref, out_ref):
        acc = jnp.zeros((CONVR, W2, 64), jnp.float32)
        for t in range(16):
            q, p = divmod(t, 4)
            sl = x_ref[q:q + CONVR, 12 * p:12 * p + W2 * 12]
            y = sl.reshape(CONVR, W2, 12)
            acc = acc + jax.lax.dot_general(
                y, w_ref[12 * t:12 * t + 12, :],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    # Case 2: 16 lane-concats -> [17, 672, 192] -> one matmul
    def k_concat(x_ref, w_ref, out_ref):
        pieces = []
        for t in range(16):
            q, p = divmod(t, 4)
            sl = x_ref[q:q + CONVR, 12 * p:12 * p + W2 * 12]
            pieces.append(sl.reshape(CONVR, W2, 12))
        big = jnp.concatenate(pieces, axis=-1)           # [17, 672, 192]
        out_ref[:] = jax.lax.dot_general(
            big, w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # Case 3: p-concat only -> [17, 672, 48], 4 matmuls of K=48
    def k_p48(x_ref, w_ref, out_ref):
        acc = jnp.zeros((CONVR, W2, 64), jnp.float32)
        for q in range(4):
            pieces = []
            for p in range(4):
                sl = x_ref[q:q + CONVR, 12 * p:12 * p + W2 * 12]
                pieces.append(sl.reshape(CONVR, W2, 12))
            big = jnp.concatenate(pieces, axis=-1)       # [17, 672, 48]
            acc = acc + jax.lax.dot_general(
                big, w_ref[48 * q:48 * q + 48, :],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    # Case 0: matmul-only floor (no im2col): [17*672, 192] @ [192, 64]
    # approximated as 12 x [1024, 192] @ [192, 64] accumulations (the full
    # block reshaped; bytes/FLOPs-equivalent matmul cost, no construction)
    def k_floor(x_ref, w_ref, out_ref):
        big = x_ref[:, :].reshape(ROWS * LANES // 192, 192)  # [1024, 192]
        acc = jnp.zeros((1024, 64), jnp.float32)
        for t in range(12):
            # scale breaks CSE so 12 distinct matmuls actually issue
            acc = acc + jax.lax.dot_general(
                big * jnp.bfloat16(1 + t), w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    run_case("floor_matmul_only", k_floor, (CONVR, W2, 64))
    run_case("reshape_16xK12", k_reshape, (CONVR, W2, 64))
    run_case("concat_1xK192", k_concat, (CONVR, W2, 64))
    run_case("pconcat_4xK48", k_p48, (CONVR, W2, 64))

    # ---- round-5 constructions: CHANNEL-MAJOR layout, no im2col ---------
    # Input strip [12, 24, 704] (s2d channels major, x on lanes).  Per conv
    # row y and x-tap kx: dot_general contracting the 48 SUBLANES of the
    # [48, 704] slab against [48, 64] weights -> U_kx [64, 704], then a
    # LANE ROLL by -kx aligns and accumulates.  Avoids both failure modes
    # of the round-2 probes (minor-dim split reshape; unaligned lane
    # slices).  The pool-fused case adds relu + 3-row max + 3-lane max +
    # a one-hot [704, 336] stride-2 selection matmul — the full stem tail
    # that never touches HBM.
    ROWS12 = 24
    LANES704 = 704

    def run_case5(name, kern, out_shape, extra_w=None):
        x = jnp.asarray(np.random.RandomState(0).randn(
            12, ROWS12, LANES704), jnp.bfloat16)
        w = jnp.asarray(np.random.RandomState(1).randn(
            4, 48, 64), jnp.bfloat16)
        ins = [x, w]
        in_specs = [
            pl.BlockSpec((12, ROWS12, LANES704), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 48, 64), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if extra_w:
            s2 = np.zeros((LANES704, 336), np.float32)
            s2[np.arange(336) * 2, np.arange(336)] = 1.0
            ins.append(jnp.asarray(s2, jnp.bfloat16))
            in_specs.append(pl.BlockSpec(
                (LANES704, 336), lambda i: (0, 0),
                memory_space=pltpu.VMEM))
        try:
            f = pl.pallas_call(
                kern, grid=(GRID,), in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    out_shape, lambda i: tuple(0 for _ in out_shape),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )
            # scan-fenced (dispatch is async through the tunnel): 4 distinct
            # leading inputs, one scalar fetch
            xs = jnp.stack([ins[0] + i for i in range(4)])

            def loop(xs, *rest):
                def body(acc, xi):
                    return acc + jnp.sum(f(xi, *rest)), ()
                tot, _ = jax.lax.scan(body, jnp.float32(0), xs)
                return tot

            g = jax.jit(loop)
            float(g(xs, *ins[1:]))
            t0 = time.perf_counter()
            float(g(xs, *ins[1:]))
            dt = (time.perf_counter() - t0) / (GRID * 4)
            print(f"{name}: {dt*1e6:8.2f} us/strip "
                  f"({dt*GRID*1e3:.2f} ms/batch-11)", flush=True)
        except Exception as e:
            lines = [l for l in str(e).splitlines()
                     if "Mosaic" in l or "must be" in l or "unsupported" in l
                     or "NotImplemented" in l or "AttributeError" in l]
            print(f"{name}: FAIL {(lines or [str(e)[:160]])[0][:160]}",
                  flush=True)

    def _conv_rows(x_ref, w_ref, n_rows):
        rows = []
        for y in range(n_rows):
            slab = x_ref[:, y:y + 4, :].reshape(48, LANES704)
            acc = None
            for kx in range(4):
                u = jax.lax.dot_general(
                    w_ref[kx], slab,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [64, 704]
                # pltpu.roll requires non-negative shifts: left-shift by kx
                # == cyclic right-shift by (lanes - kx)
                u = pltpu.roll(u, LANES704 - kx, 1) if kx else u
                acc = u if acc is None else acc + u
            rows.append(acc)
        return rows

    # Case 5: conv only (17 rows) — does the construction compile, and
    # what is its pure conv cost?
    def k_subc(x_ref, w_ref, out_ref):
        rows = _conv_rows(x_ref, w_ref, CONVR)
        for y in range(CONVR):
            out_ref[y] = rows[y]

    # Case 6: FULL fused stem tail: conv + relu + 3x2 maxpool, one strip
    # -> 8 pooled rows [64, 336] (o-major; the NHWC transpose happens in
    # XLA and is costed separately in the A/B).
    def k_pool(x_ref, w_ref, s2_ref, out_ref):
        rows = [jnp.maximum(r, 0.0) for r in _conv_rows(x_ref, w_ref, CONVR)]
        for py in range(8):
            m = jnp.maximum(jnp.maximum(rows[2 * py], rows[2 * py + 1]),
                            rows[2 * py + 2])
            m = jnp.maximum(jnp.maximum(m, pltpu.roll(m, LANES704 - 1, 1)),
                            pltpu.roll(m, LANES704 - 2, 1))
            out_ref[py] = jax.lax.dot_general(
                m.astype(jnp.bfloat16), s2_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    run_case5("subcontract_conv17", k_subc, (CONVR, 64, LANES704))
    run_case5("pool_fused_stem", k_pool, (8, 64, 336), extra_w=True)

    # ---- XLA reference costs at the same batch geometry -----------------
    import time as _t

    def xla_ref(name, fn, x, *args):
        xs = jnp.stack([x + i for i in range(4)])

        def loop(xs, *rest):
            def body(acc, xi):
                return acc + jnp.sum(fn(xi, *rest)), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return tot

        g = jax.jit(loop)
        float(g(xs, *args))
        t0 = _t.perf_counter()
        float(g(xs, *args))
        print(f"{name}: {(_t.perf_counter() - t0) / 4 * 1e3:.2f} "
              "ms/batch-11", flush=True)

    imgs = jnp.asarray(np.random.RandomState(2).randn(
        11, 800, 1344, 3), jnp.bfloat16)
    wc = jnp.asarray(np.random.RandomState(3).randn(7, 7, 3, 64),
                     jnp.bfloat16)

    def conv1(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def stem(x, w):
        y = jnp.maximum(conv1(x, w).astype(jnp.bfloat16), 0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    xla_ref("xla_conv1_only", conv1, imgs, wc)
    xla_ref("xla_conv1_pool", stem, imgs, wc)


if __name__ == "__main__":
    main()
