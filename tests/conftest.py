"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding logic is validated on
host-platform virtual devices (the same mechanism the driver's
``dryrun_multichip`` uses).  This environment's axon TPU plugin force-selects
``jax_platforms="axon,cpu"`` at interpreter start (sitecustomize), so the
env var alone is not enough — the config must be updated post-import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
