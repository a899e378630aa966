"""Is the stable pair-argsort the bulk of the resident prep's 7.2 ms?

Variants, each inside one jit, scalar-fetch fenced:

  argsort    jnp.argsort(key, stable=True)              (production today)
  packsort   jnp.sort((key << 17) | iota) -> key_s, order in ONE sort pass
  gathers    the 6 per-roi [n] int gathers + [n,16] geom gather (by a fixed
             order) — isolates gather cost from sort cost
  scatters   the 4 rank-table scatters + cumsum
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--rois", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    rng = np.random.RandomState(0)
    b, n = args.batch, args.rois
    nn = b * n
    keys = jnp.asarray(rng.randint(0, 1540, (args.iters, nn)), jnp.int32)
    geom = jnp.asarray(rng.randn(nn, 16), jnp.float32)
    cols = jnp.asarray(rng.randint(0, 300, (6, nn)), jnp.int32)

    def run_argsort(keys):
        def body(acc, k):
            order = jnp.argsort(k, stable=True).astype(jnp.int32)
            return acc + jnp.sum(order[::97].astype(jnp.float32)), ()
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total

    def run_packsort(keys):
        iota = jnp.arange(nn, dtype=jnp.int32)
        def body(acc, k):
            packed = jnp.sort((k << 17) | iota)
            order = packed & ((1 << 17) - 1)
            key_s = packed >> 17
            return acc + jnp.sum((order[::97] + key_s[::97])
                                 .astype(jnp.float32)), ()
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total

    def run_gathers(keys):
        def body(acc, k):
            order = jnp.clip(k, 0, nn - 1)  # stand-in permutation
            gs = [c[order] for c in cols]
            ge = geom[order]
            s = sum(jnp.sum(g[::97].astype(jnp.float32)) for g in gs)
            return acc + s + jnp.sum(ge[::97]), ()
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total

    def run_scatters(keys):
        def body(acc, k):
            key_s = jnp.sort(k)  # need sorted keys for chg; include ONE sort
            chg = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), key_s[1:] != key_s[:-1]])
            rank = jnp.cumsum(chg.astype(jnp.int32)) - 1
            tabs = [jnp.zeros((nn,), jnp.int32).at[rank].set(c)
                    for c in cols[:4]]
            s = sum(jnp.sum(t[::97].astype(jnp.float32)) for t in tabs)
            return acc + s, ()
        total, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return total

    for name, fn in (("argsort", run_argsort), ("packsort", run_packsort),
                     ("gathers", run_gathers), ("scatters", run_scatters)):
        jrun = jax.jit(fn)
        out1 = float(jrun(keys))
        t0 = time.perf_counter()
        out2 = float(jrun(keys))
        dt = time.perf_counter() - t0
        assert np.isfinite(out2) and out1 == out2
        print(f"{name:9s}: {dt / args.iters * 1e3:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
