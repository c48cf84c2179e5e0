"""Test configuration: run JAX on CPU with x64 and 8 virtual devices.

Multi-chip sharding tests use the virtual CPU mesh (the driver validates
the real multi-chip path separately via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("DNS_TPU_X64", "1")

import jax  # noqa: E402

# some plugin environments (axon tunnel) override JAX_PLATFORMS; the config
# knob wins over the plugin registration
jax.config.update("jax_platforms", "cpu")
