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

jax.config.update("jax_platforms", "cpu")
