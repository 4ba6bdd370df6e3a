"""Multi-host bootstrap.

The reference has no distributed execution at all (SURVEY.md section 2.10).
On a multi-host TPU slice, call :func:`initialize_distributed` once per
process before any JAX computation; the global mesh then spans all hosts
(ICI within a slice, DCN across slices) and the sharding catalog in
``parallel.mesh`` applies unchanged — ``jax.make_mesh`` over
``jax.devices()`` returns the global device set.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` for multi-host execution.

    With no arguments, relies on TPU auto-detection (GCE metadata) or the
    standard ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` environment variables. Returns True if distributed
    mode was initialized, False when running single-process (no coordinator
    configured) — callers can treat False as the single-host path.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") not in (None, "",
                                                                "localhost")
    if coordinator_address is None and not on_tpu_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(dp: Optional[int] = None, tp: Optional[int] = None):
    """Build a (dp, tp) mesh over ALL devices of all hosts.

    Defaults: tp = devices per host (ICI-local tensor parallelism),
    dp = number of hosts (data parallel over DCN) — the layout that keeps
    the per-token collectives on ICI.
    """
    import jax
    from ee274_convexcaldera_llm_quantization_tpu.parallel.mesh import (
        make_mesh)

    n = len(jax.devices())
    if tp is None:
        tp = max(1, jax.local_device_count())
    if dp is None:
        dp = n // tp
    return make_mesh(dp=dp, tp=tp)
