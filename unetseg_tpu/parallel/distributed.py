"""Multi-host (DCN) initialization and study-level sharding helpers.

The reference is strictly single-process/single-GPU (SURVEY §2 distributed
row: "None — zero collectives").  The TPU framework scales out two ways:

* **intra-slice (ICI)**: the (dp, sp) mesh of parallel/mesh.py — batch and
  spatial sharding inside one v5e slice; XLA collectives ride ICI.
* **inter-host (DCN)**: `jax.distributed.initialize` + a global mesh.  For
  inference the natural DCN decomposition is *study-level*: each host owns
  whole studies (no cross-host traffic at all — the embarrassing axis), while
  training uses the global dp axis with gradient all-reduce crossing DCN only
  once per step.

These helpers wrap the runtime setup; they are no-ops in single-process runs
so the same code path works everywhere.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime (multi-host DCN).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or TPU metadata autodetection.
    Returns True if a multi-process runtime was initialized, False for
    single-process (no-op, like the reference's whole existence).
    """
    # Honor the documented env-var interface: the old code computed `num`
    # from the env and then DISCARDED it (and never read the coordinator/
    # process-id vars at all), so env-configured multi-host init silently
    # fell through to autodetection (round-4 review finding).
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes if num_processes is not None else num,
        process_id=process_id,
    )
    return True


def global_mesh(sp: int = 1):
    """(dp, sp) mesh over ALL devices of all processes.

    dp spans hosts (DCN) then chips (ICI); sp stays intra-host so conv halo
    exchanges never cross DCN.
    """
    from unetseg_tpu.parallel.mesh import make_mesh

    return make_mesh(len(jax.devices()), sp=sp, devices=jax.devices())


def shard_studies(study_paths: Sequence[str]) -> List[str]:
    """Study-level sharding across hosts: each process takes studies
    round-robin by process index — zero inter-host communication, the
    throughput-optimal decomposition for independent studies."""
    pid = jax.process_index()
    n = jax.process_count()
    return [p for i, p in enumerate(study_paths) if i % n == pid]
