"""Multi-host runtime test: a REAL 2-process JAX job over localhost.

Each process gets 4 virtual CPU devices (global mesh = 8 devices across 2
controllers); the worker script runs a global psum, three sharded fusion
frames and the cross-host checkpoint gather.  This is the CI stand-in for
the N-host TPU pod deployment (parallel/distributed.py docstring).
"""

import os

from surfelmapping_tpu.parallel.distributed import spawn_cpu_processes

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def test_two_process_cpu_job():
    results = spawn_cpu_processes(
        WORKER, num_processes=2, devices_per_process=4,  # ephemeral port
    )
    assert len(results) == 2
    for r in results:
        assert r.returncode == 0
        assert "OK count=" in r.stdout
