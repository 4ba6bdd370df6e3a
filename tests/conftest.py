"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding is validated on
a CPU host-platform mesh (``xla_force_host_platform_device_count=8``), which
exercises the same GSPMD partitioning paths XLA uses on a real slice.

The heavy lifting (stripping the TPU-relay env that slows every XLA compile)
happens in the early plugin ``ccq_testenv`` (see pyproject.toml addopts);
this conftest only covers direct invocations that bypass pyproject.
"""

import os
import sys

import pytest

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The full suite performs on the order of a thousand XLA CPU compiles;
    with every executable retained in-process, late large compiles (the
    speculative-decoding graphs are the biggest) have intermittently
    SIGSEGV'd inside ``backend_compile_and_load`` (reproduced across
    rounds; each file passes in isolation). Bounding the retained compile
    state is the mitigation; the per-module recompiles it causes are noise
    compared to suite runtime.
    """
    yield
    import jax
    jax.clear_caches()
