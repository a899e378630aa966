import os

# Tests run on a virtual 8-device CPU mesh — the TPU analogue of a fake
# backend (SURVEY.md §4).  XLA_FLAGS must be set before jax initializes a
# backend; the axon sitecustomize forces jax_platforms="axon,cpu", so the
# platform choice is overridden via jax.config (env vars are clobbered).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# SEAM_TEST_TPU=1 leaves the real TPU visible so `pytest -m tpu` runs the
# compiled-kernel regression tests on the chip (VERDICT r1 #8); default is
# the virtual CPU mesh.
if os.environ.get("SEAM_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the full-detector train graphs take minutes to
# compile on this single-core host; cache across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
