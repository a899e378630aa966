"""AOT export of the serving forward as a StableHLO artifact (jax.export).

Produces a self-contained serialized program — the deployment story the
torch reference lacks (it requires the full python stack at serving time).
The artifact replays on any runtime with the same devices via
jax.export.deserialize.

Usage:
  python tools/export_serving.py --out serving.bin [--batch 11]
  python tools/export_serving.py --check serving.bin   # roundtrip test
"""

import argparse
import sys

sys.path.insert(0, ".")


def build(batch: int, canvas=(800, 1344)):
    import jax
    import jax.numpy as jnp

    from seam_match_rcnn_tpu.config import ModelConfig
    from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model

    cfg = ModelConfig()
    model, variables = init_model(cfg, video=True, canvas=(256, 320))

    def fn(variables, images, sizes):
        out = model.apply(
            variables, images, sizes, method=MatchRCNN.inference,
            with_masks=True, with_match=True, with_roi_features=False,
        )
        return out

    images = jnp.zeros((batch, canvas[0], canvas[1], 3), jnp.float32)
    sizes = jnp.zeros((batch, 2), jnp.int32)
    return fn, variables, images, sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--check", type=str, default=None)
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    args = ap.parse_args()

    import jax

    if args.check:
        with open(args.check, "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        print("deserialized:", exported.fun_name,
              "platforms:", exported.platforms,
              "n_inputs:", len(exported.in_avals))
        return

    fn, variables, images, sizes = build(args.batch, (args.height, args.width))
    exported = jax.export.export(jax.jit(fn))(variables, images, sizes)
    data = exported.serialize()
    out = args.out or "serving.bin"
    with open(out, "wb") as f:
        f.write(data)
    print(f"wrote {out}: {len(data) / 1e6:.1f} MB, platforms={exported.platforms}")


if __name__ == "__main__":
    main()
