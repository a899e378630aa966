"""Packaging surface: pyproject console scripts resolve, native ext builds.

The reference has no packaging (users run repo-root scripts,
/root/reference/README.md:74-110); this framework installs with
`pip install -e .` and exposes each CLI as a console script.  These tests
pin the metadata without requiring an install.
"""

import importlib
import pathlib
import tomllib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _project():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_console_scripts_resolve():
    scripts = _project()["scripts"]
    # one script per reference CLI surface (+ serve); deepf_to_coco is the
    # DeepFtoCoco.py equivalent
    assert len(scripts) == 7
    for name, target in scripts.items():
        mod, func = target.split(":")
        m = importlib.import_module(mod)
        fn = getattr(m, func)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_version_matches_package():
    import seam_match_rcnn_tpu

    v = getattr(seam_match_rcnn_tpu, "__version__", None)
    assert v == _project()["version"]
