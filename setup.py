"""Build hooks: compile the optional native RLE codec during install.

`pip install -e .` (or `python -m build`) compiles
seam_match_rcnn_tpu._seamops from native/rle.cc — the host-side C++
replacement for pycocotools' `_mask` extension that the reference depends
on (/root/reference/stuffs/mask_utils.py:3).  The extension is OPTIONAL:
any compile failure is downgraded to a warning and ops/rle.py falls back to
its numpy codec, so pure-Python installs (no toolchain) still work.
`python native/build.py` remains the in-place dev build.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install over the optional native codec."""

    def run(self):
        try:
            super().run()
        except Exception as exc:  # toolchain missing / flags unsupported
            self._warn(exc)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:
            self._warn(exc)

    @staticmethod
    def _warn(exc):
        import warnings

        warnings.warn(
            f"native _seamops extension failed to build ({exc}); "
            "falling back to the numpy RLE codec (ops/rle.py)"
        )


setup(
    ext_modules=[
        Extension(
            "seam_match_rcnn_tpu._seamops",
            sources=["native/rle.cc"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
