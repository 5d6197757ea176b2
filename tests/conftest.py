"""Test harness config: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths (mesh, psum, all-gather) run in CI without a TPU
pod (SURVEY.md §4 item d)."""

import os

# Force-override: the build machine's sitecustomize registers a real TPU
# tunnel (JAX_PLATFORMS=axon) and imports jax at interpreter start, so the
# env var is already captured — jax.config.update is the reliable override.
# Tests must run on the virtual 8-device CPU backend regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism and speed for tests
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
