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
    def k_floor(x_ref, w_ref, out_ref):
        y = x_ref[:CONVR, :].reshape(CONVR * 8192 // 192 * 0 + CONVR, 8192)
        # fake im2col: just slice a [17*672, 192]-sized chunk via reshape of
        # the full block (bytes-equivalent matmul cost)
        big = x_ref[:, :].reshape(ROWS * LANES // 192, 192)[: CONVR * W2]
        out_ref[:] = jax.lax.dot_general(
            big, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(CONVR, W2, 64)

    run_case("floor_matmul_only", k_floor, (CONVR, W2, 64))
    run_case("reshape_16xK12", k_reshape, (CONVR, W2, 64))
    run_case("concat_1xK192", k_concat, (CONVR, W2, 64))
    run_case("pconcat_4xK48", k_p48, (CONVR, W2, 64))


if __name__ == "__main__":
    main()
