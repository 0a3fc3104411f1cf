"""Multi-host distributed runtime for the sharded surfel engine.

The reference is strictly single-process (one GL context,
src/SurfelMapping.cpp; SURVEY.md section 2d) — this module is pure
north-star scope: run ``parallel/sharded.py``'s block-sharded fusion over a
mesh that spans HOSTS, with one JAX distributed runtime per job.

Design (the standard JAX multi-controller recipe):
  * every process calls :func:`initialize` (a thin wrapper over
    ``jax.distributed.initialize`` with env-var defaults) and then sees the
    GLOBAL device set via ``jax.devices()``;
  * :func:`fusion_mesh` builds the 1-D ``shard`` mesh over all global
    devices — ``make_sharded_step``'s collectives then ride ICI within a
    host and DCN across hosts with no code change (the step is SPMD;
    shard_map + psum/pmin/pmax lower to XLA collectives on whatever the
    mesh spans);
  * per-host input: every process feeds the SAME frame tensors (replicated
    inputs), as the per-frame images are small; the map state is what
    shards;
  * checkpoints: :func:`allgather_state` materializes the full sharded map
    on every host via jax.experimental.multihost_utils (DCN), after which
    process 0 writes the reference-format binary.

Testing without hardware: JAX supports multi-process over CPU backends —
:func:`spawn_cpu_processes` launches N local processes, each with
``xla_force_host_platform_device_count`` virtual CPU devices, pointed at a
localhost coordinator.  tests/test_distributed.py runs a real 2-process x
4-device job through a psum and a sharded fusion step.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax
import numpy as np
from jax.sharding import Mesh

from .sharded import AXIS, ShardedMapState, gather_sharded_map


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join (or create) the job's distributed runtime.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can configure workers
    purely through the environment.  A single-process job (no coordinator
    configured) is a no-op — the engine then runs exactly as before.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def fusion_mesh(n_devices: int | None = None) -> Mesh:
    """The 1-D ``shard`` mesh over the job's global devices (all hosts)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def allgather_state(state: ShardedMapState) -> ShardedMapState:
    """Materialize the full (addressable) sharded state on every host.

    Multi-host arrays are only partially addressable per process; this
    all-gathers the shards over DCN so gather_sharded_map / checkpointing
    can run host-side.  Single-host states pass through unchanged.
    """
    if jax.process_count() == 1:
        return state
    from jax.experimental import multihost_utils

    # tiled=True: concatenate along axis 0 (the shard axis) instead of
    # stacking — required for global non-fully-addressable arrays
    return jax.tree.map(
        lambda x: multihost_utils.process_allgather(x, tiled=True), state
    )


def save_checkpoint(
    state: ShardedMapState,
    n_devices: int,
    path: str,
    start_id: int = 0,
    end_id: int = 0,
) -> None:
    """Write the reference-format binary map (process 0 only; collective —
    every process must call it)."""
    from ..surfels import save_map

    full = allgather_state(state)
    if jax.process_index() == 0:
        save_map(gather_sharded_map(full, n_devices), path, start_id, end_id)


# ---------------------------------------------------------------------------
# Local multi-process CPU launcher (CI harness for the DCN path)
# ---------------------------------------------------------------------------

def spawn_cpu_processes(
    script: str,
    num_processes: int,
    devices_per_process: int,
    port: int | None = None,
    timeout: float = 600.0,
    extra_env: dict | None = None,
) -> list[subprocess.CompletedProcess]:
    """Run ``script`` (a python file path) in ``num_processes`` local
    processes, each with ``devices_per_process`` virtual CPU devices and the
    coordinator env configured — a real multi-controller JAX job on one
    machine.  ``port=None`` binds an ephemeral coordinator port so two
    concurrent jobs on one host never collide.  Returns the completed
    processes (raises on any failure)."""
    if port is None:
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                f"--xla_force_host_platform_device_count={devices_per_process}"
            ),
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES=str(num_processes),
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("JAX_NUM_CPU_DEVICES", None)
        if extra_env:
            env.update(extra_env)
        procs.append(
            subprocess.Popen(
                [sys.executable, script],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    results = []
    failed = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        results.append(
            subprocess.CompletedProcess(p.args, p.returncode, out, None)
        )
        if p.returncode != 0:
            failed.append((pid, out))
    if failed:
        msgs = "\n".join(
            f"--- process {pid} ---\n{out[-3000:]}" for pid, out in failed
        )
        raise RuntimeError(f"distributed CPU job failed:\n{msgs}")
    return results
