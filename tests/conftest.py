"""Test configuration: force CPU with 8 virtual devices and enable x64.

Tests run on an 8-device virtual CPU mesh so multi-chip sharding paths are
exercised without TPU hardware; x64 gives tight numerical oracles (the TPU
production path is f32 + iterative refinement, benchmarked separately).

Note: this environment registers an `axon` TPU platform via sitecustomize and
sets JAX_PLATFORMS=axon, so we must override the platform via jax.config (env
vars alone are not honored once the plugin is registered).
"""

import os

# Must be set before the CPU backend is first initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
