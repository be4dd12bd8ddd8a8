"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding logic is validated on
host-platform virtual devices (the same mechanism the driver's
``dryrun_multichip`` uses).  Must be set before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
