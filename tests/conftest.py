"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without real hardware by asking XLA's host
platform for 8 fake devices (the same mechanism the driver's
``dryrun_multichip`` uses).  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
