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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Serialize the XLA:CPU parallel LLVM codegen. On this 2-core host the
# compiler's default 32-way codegen split reproducibly ABORTS (SIGSEGV /
# hard abort mid-compile) when a concurrent CPU-heavy process contends
# for the cores — three different compile-heavy test modules died this
# way across rounds 3-5, always at the largest full-pipeline program and
# always passing solo. One codegen thread removes the race class for a
# few seconds of extra compile time per big program.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
