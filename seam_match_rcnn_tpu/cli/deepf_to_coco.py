"""Dataset conversion CLI (mirrors /root/reference/DeepFtoCoco.py usage,
README.md:74-77)."""

from __future__ import annotations

import argparse

from ..data.convert import convert


def main(argv=None):
    p = argparse.ArgumentParser("DeepFashion2 -> COCO converter")
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--annos_dir", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    out = convert(args.image_dir, args.annos_dir, args.out, limit=args.limit)
    print(f"wrote {len(out['images'])} images, {len(out['annotations'])} annotations")


if __name__ == "__main__":
    main()
