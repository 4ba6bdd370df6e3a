"""Early pytest plugin: strip the axon TPU-relay env and force a CPU mesh.

The container's sitecustomize registers a remote-compile TPU relay in every
python process (``PALLAS_AXON_*``), which adds ~1s of network latency to each
XLA compilation — including CPU ones — making the test suite ~50x slower.
This module is loaded via ``addopts = "-p ccq_testenv"`` (pyproject.toml),
i.e. at plugin-registration time *before* pytest enables output capture, so
the re-exec below preserves test output.

The re-exec'd process starts without the relay env, so sitecustomize skips
the registration entirely, and tests run on a virtual 8-device CPU mesh.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "CCQ_TEST_REEXEC"):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_"))}
    env["CCQ_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
