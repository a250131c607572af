"""Test harness config: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; sharding tests need multiple devices,
so we force the host platform with 8 virtual devices BEFORE jax is imported
anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu" via
# jax.config at interpreter start, overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA recompiles of
# the LM while_loop variants; caching them across runs cuts repeat wall time.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/horti_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_spec():
    """A reduced decoder (4x64) for fast differential tests."""
    from hortimapping_tpu.models.decoder import DecoderSpec

    return DecoderSpec(code_length=8, dims=(64, 64, 64, 64), latent_in=(2,), clamping_distance=0.1)


@pytest.fixture(scope="session")
def full_spec():
    """The production sweet-pepper architecture (8x512, latent_in=[4])."""
    from hortimapping_tpu.models.decoder import DecoderSpec

    return DecoderSpec(code_length=32, dims=(512,) * 8, latent_in=(4,), clamping_distance=0.1)
