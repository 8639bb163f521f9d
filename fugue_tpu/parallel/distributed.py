"""Multi-host (pod) bootstrap: process initialization + DCN×ICI meshes.

SURVEY.md §5 "Distributed communication backend" plan-of-record: a single
module wrapping ``jax.distributed.initialize``, two-level mesh construction
over ICI (within-host chip interconnect) and DCN (across-host data-center
network), and the collective vocabulary the engines already speak
(``lax.pmean``/``psum`` accept a TUPLE of axis names, so every
``chain_axis=...`` code path in hmc/nuts/smc works unchanged over a
two-level mesh by passing ``chain_axis=("hosts", "chains")``).

The reference has nothing to port here (single-threaded Rust,
Cargo.toml:48-52); this is the invented TPU-native structure. Design rules
(scaling-book recipe): shard the chain/particle batch over BOTH axes so the
hot per-transition collectives (acceptance pmean, Welford psum) are
hierarchical — XLA reduces within a host over ICI first, then once per host
over DCN — and keep everything else replicated.

Pod runbook (v5e multi-host):
    # on every host (SLURM/GKE set the env; TPU pods auto-detect all three):
    #   JAX_COORDINATOR_ADDRESS=host0:8476
    #   JAX_NUM_PROCESSES=4
    #   JAX_PROCESS_ID=$i
    import fugue_tpu as ft
    ft.parallel.initialize_distributed()           # no-op on one host
    mesh = ft.parallel.make_pod_mesh()             # ("hosts", "chains")
    res = ft.parallel.sharded_hmc_chain(
        key, model, n_chains=4096, mesh=mesh,
    )                                              # every host: same result
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import CHAIN_AXIS

HOST_AXIS = "hosts"

_initialized = False


def distributed_env(environ=None) -> dict:
    """Read the bootstrap parameters from the environment.

    Recognizes JAX's own variable names plus the common scheduler aliases,
    so one binary runs under SLURM, GKE JobSet indexes, or hand-rolled
    launch scripts. Returns {} when nothing is set (single-process run or a
    TPU pod where libtpu auto-detects everything).
    """
    env = os.environ if environ is None else environ
    coord = env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS")
    nproc = env.get("JAX_NUM_PROCESSES") or env.get("NUM_PROCESSES")
    pid = env.get("JAX_PROCESS_ID")
    if pid is None:
        pid = env.get("PROCESS_ID")
    if pid is None:
        pid = env.get("JOB_COMPLETION_INDEX")  # GKE JobSet
    if pid is None:
        pid = env.get("SLURM_PROCID")
    if nproc is None:
        nproc = env.get("SLURM_NTASKS")
    out = {}
    if coord is not None:
        out["coordinator_address"] = coord
    if nproc is not None:
        out["num_processes"] = int(nproc)
    if pid is not None:
        out["process_id"] = int(pid)
    return out


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Bootstrap the multi-process JAX runtime (idempotent).

    Explicit arguments win; otherwise the environment (``distributed_env``)
    is consulted; on a Cloud TPU pod slice all three are auto-detected by
    ``jax.distributed.initialize`` itself. Returns True when a multi-process
    runtime was (or already had been) initialized, False when this is a
    single-process run (nothing to do) — so library code can call it
    unconditionally.
    """
    global _initialized
    if _initialized:
        return True
    params = distributed_env()
    if coordinator_address is not None:
        params["coordinator_address"] = coordinator_address
    if num_processes is not None:
        params["num_processes"] = num_processes
    if process_id is not None:
        params["process_id"] = process_id
    if not params and jax.default_backend() != "tpu":
        # nothing configured and no TPU auto-detection available
        return False
    if params.get("num_processes") == 1 and "coordinator_address" not in params:
        return False
    jax.distributed.initialize(**params, **kwargs)
    _initialized = True
    return True


def make_pod_mesh(
    axis_names: Tuple[str, str] = (HOST_AXIS, CHAIN_AXIS),
    devices=None,
) -> Mesh:
    """Two-level DCN×ICI mesh: hosts × local devices.

    The first axis enumerates processes (collectives over it cross DCN);
    the second axis enumerates each process's local devices (collectives
    ride ICI). On a single host this degenerates to a (1, n_local) mesh —
    the same program runs anywhere. Device order within each mesh row is
    the host's local order, so ICI-neighbor collectives stay on-chip.
    """
    if devices is None:
        devices = jax.devices()
    n_proc = max(jax.process_count(), 1)
    per_host = len(devices) // n_proc
    if per_host * n_proc != len(devices):
        raise ValueError(
            f"{len(devices)} devices do not split evenly over {n_proc} hosts"
        )
    if n_proc > 1:
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                (1, per_host), (n_proc, 1), devices=devices
            ).reshape(n_proc, per_host)
            return Mesh(grid, axis_names)
        except Exception:
            pass  # fall through to the process-id grouping below
    # group by owning process so axis 0 is the DCN axis
    order = sorted(devices, key=lambda d: (d.process_index, d.id))
    grid = np.asarray(order).reshape(n_proc, per_host)
    return Mesh(grid, axis_names)


def pod_chain_axes(mesh: Mesh) -> Tuple[str, ...]:
    """The axis-name tuple to pass as ``chain_axis`` for a mesh built by
    ``make_pod_mesh`` (collectives reduce over hosts AND local chips)."""
    return tuple(mesh.axis_names)


def process_local_slice(global_n: int, mesh: Mesh) -> slice:
    """The [start, stop) rows of a globally (host-)sharded chain batch that
    live on THIS process — for building per-host input shards when arrays
    are too large to materialize globally."""
    n_proc = max(jax.process_count(), 1)
    per = global_n // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)
