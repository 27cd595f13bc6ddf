"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
imports, so multi-chip sharding tests run anywhere (the TPU-world equivalent
of testing multi-node without a cluster — SURVEY.md §4)."""

import os

# setdefault on purpose: under axon (remote TPU tunnel) the env exports
# JAX_PLATFORMS=axon and the suite runs there — this 1-core host makes the
# CPU backend far slower than the tunnel (single-threaded XLA compiles; 8
# virtual devices time-slice one core), so only the tests that NEED the
# 8-device mesh, or true-f32 torch parity, pin jax.devices("cpu") leaves.
# Checkpoint I/O must stay bulk (utils/checkpoint.py) — per-leaf transfers
# through the tunnel turn a 1 s save/restore into minutes.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

from __graft_entry__ import host_cache_dir  # noqa: E402

# Persistent compilation cache makes repeated test runs fast. The dir is
# keyed by host CPU features: XLA:CPU AOT entries written under different
# machine features fail to load AND are never rewritten, so a shared dir
# poisons every run into recompiling forever (round-3: 799 s suite).
jax.config.update("jax_compilation_cache_dir", host_cache_dir())
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# This environment's TPU plugin overrides JAX_PLATFORMS, so tests may run on
# a real TPU where the default f32 matmul precision is bf16-based — numeric
# parity tests (finite differences, cache-vs-full decode, sharded-vs-single)
# need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
