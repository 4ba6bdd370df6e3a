"""Two-process ``jax.distributed`` bring-up smoke test (VERDICT r1 #8).

The reference is single-process (SURVEY.md section 2.10); our multi-host
story is ``parallel.bootstrap.initialize_distributed`` + the mesh catalog.
This test proves the bootstrap path is live code: two OS processes
initialize a coordinator, see each other's CPU devices (4 local each,
8 global), build the DCN(dp=hosts) x ICI(tp=local) mesh from
``bootstrap.global_mesh``, and run one jitted sharded computation whose
result depends on both processes' shards (a cross-process psum via the
sharded-sum lowering).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import importlib.util
pid = int(sys.argv[1]); port = sys.argv[2]
# jax.distributed.initialize must run before ANY backend-touching call;
# importing the package materializes codebook constants, so load the
# bootstrap module standalone first (exactly what a multi-host launcher
# script would do).
root = os.environ["PYTHONPATH"]
spec = importlib.util.spec_from_file_location(
    "ccq_bootstrap", os.path.join(
        root, "ee274_convexcaldera_llm_quantization_tpu", "parallel",
        "bootstrap.py"))
bootstrap = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bootstrap)
ok = bootstrap.initialize_distributed(f"127.0.0.1:{port}", 2, pid)
assert ok, "initialize_distributed returned False with explicit coordinator"
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = bootstrap.global_mesh()          # dp = hosts = 2, tp = local = 4
assert mesh.shape == {"dp": 2, "tp": 4}, mesh.shape

# Global (8, 16) input sharded over dp: each process owns 4 rows. Row i
# holds the value i, so the global sum identifies every shard uniquely.
sharding = NamedSharding(mesh, P("dp", None))
def make_shard(index):
    rows = np.arange(8)[index[0]]
    return np.broadcast_to(rows[:, None], (len(rows), 16)).astype(np.float32)
x = jax.make_array_from_callback((8, 16), sharding, make_shard)
w = jax.make_array_from_callback(
    (16, 16), NamedSharding(mesh, P(None, "tp")),
    lambda idx: np.eye(16, dtype=np.float32)[idx])

@jax.jit
def f(x, w):
    return jnp.sum(x @ w)                # cross-process reduction

out = float(f(x, w))
expected = float(sum(range(8)) * 16)
assert out == expected, (out, expected)
# success marker goes to a FILE: Gloo's C-level log writes share the
# stdout pipe and can interleave mid-print, splitting the marker string
with open(os.path.join(os.path.dirname(sys.argv[0]),
                       f"dist_ok_{pid}"), "w") as fh:
    fh.write(f"DIST_OK {pid}")
print("DIST_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_bringup(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        marker = tmp_path / f"dist_ok_{pid}"
        assert marker.exists() and marker.read_text() == f"DIST_OK {pid}", \
            out
