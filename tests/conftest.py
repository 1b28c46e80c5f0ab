"""Test environment: force a virtual 8-device CPU mesh.

Kernels are pure functions, so `jax.jit` on CPU is the reference-accurate
fake backend (SURVEY.md §4); multi-chip sharding tests run on 8 virtual CPU
devices via XLA's host platform device count.
"""

import os

# Hard override: the environment's sitecustomize pins JAX_PLATFORMS to the
# real TPU; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize imports jax at interpreter start and latches
# jax_platforms to "axon,cpu" — the env var above is then ignored, so force
# the config directly (the CPU client initialises lazily, so the
# host_platform_device_count flag still applies).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def default_scene():
    from gpu_raytracer_tpu import build_default_scene

    return build_default_scene()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
