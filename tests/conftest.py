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
# XLA:CPU compiler stability notes (round 5, measured):
# - The default config (32-way parallel LLVM codegen) nondeterministically
#   ABORTS the largest full-pipeline compiles when a concurrent CPU-heavy
#   process contends for the 2 cores (three modules died this way across
#   rounds 3-5; each passes solo).
# - Serializing the codegen (--xla_cpu_parallel_codegen_split_count=1)
#   fixes that race but introduces a WORSE, deterministic crash: after
#   a few hundred in-process compiles the compiler segfaults on a tiny
#   program (reproduced 4/4 at tests/test_lepard.py::test_full_depth_config
#   at suite position 69%, quiet host included; the same test and its
#   whole module pass in a fresh process). Round-4 full-suite runs with
#   the default split were green on quiet hosts.
# Net: keep the DEFAULT compiler config here (quiet-host `pytest tests/`
# stays green, as in round 4); on contended hosts run
# `scripts/run_tests.sh`, whose xdist worker-restart + --last-failed
# retry contains BOTH crash classes (validated green twice under two
# full-core hogs, logs/pytest_r5_hog{2,3}.log).
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _reset_jax_compile_state():
    """Drop jax's live compiled-executable/tracing caches after every
    module. The XLA:CPU compiler segfaults DETERMINISTICALLY once a
    single process accumulates a few hundred live compiled programs
    (round 5: reproduced 6/6 at ~70% of the full suite, quiet host and
    default compiler flags included, at whichever compile-heavy module
    sits past the threshold — the very whack-a-mole pattern of rounds
    3-5; every such module passes in a fresh process). Modules rarely
    share programs, so per-module cache clearing costs little
    recompilation while keeping the live-program count far below the
    crash threshold."""
    yield
    jax.clear_caches()
