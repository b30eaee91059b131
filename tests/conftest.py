"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip).

The session may preload a TPU platform plugin that force-selects itself via
``jax.config.update("jax_platforms", ...)`` at interpreter startup
(sitecustomize), so overriding the environment variable is not enough — the
config must be re-updated after importing jax, before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
