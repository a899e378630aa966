"""Build the native _seamops extension in place.

Usage: python native/build.py
Produces seam_match_rcnn_tpu/_seamops.<abi>.so; ops/rle.py picks it up
automatically and falls back to numpy when absent.
"""

import os
import subprocess
import sys
import sysconfig


def build():
    here = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(os.path.dirname(here), "seam_match_rcnn_tpu")
    src = os.path.join(here, "rle.cc")
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(pkg, "_seamops" + suffix)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print("built", out)
    return out


if __name__ == "__main__":
    build()
