"""Test config: run everything on a virtual 8-device CPU mesh.

The container globally forces the axon TPU backend (JAX_PLATFORMS=axon via
sitecustomize, with slow remote compiles), so tests explicitly switch the
already-imported jax to CPU *before any backend use* and request 8 virtual
host devices — the same environment the driver uses for the multi-chip
dry-run. Tests that want the real TPU chip opt in via the ``tpu`` marker
and are excluded from the default run.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
