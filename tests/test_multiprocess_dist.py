"""REAL multi-process jax.distributed run (2 CPU processes on localhost).

The reference tests multi-node only by running it (SURVEY §4); here a
2-process coordinator-based jax.distributed group exercises the actual
cross-host paths — world_size, barrier, all_gather_host, and the
loss-aware sampler's cross-process gather — not a simulation.
Reference: guided_diffusion/dist_util.py:21-43, resample.py:71-104.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    os.environ.pop("XLA_FLAGS", None)      # no virtual-device override here
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address=sys.argv[2],
                               num_processes=2, process_id=pid,
                               local_device_ids=[0])
    from autodiffusion_tpu.parallel.dist import (all_gather_host, barrier,
                                                 rank, world_size)
    assert world_size() == 2, world_size()
    assert rank() == pid, (rank(), pid)
    barrier("start")

    # cross-process host gather: each rank contributes distinct data
    got = all_gather_host(np.array([pid * 10 + 1, pid * 10 + 2]))
    got = np.asarray(got).reshape(-1)
    assert sorted(got.tolist()) == [1, 2, 11, 12], got

    # loss-aware sampler sees BOTH ranks' (t, loss) pairs
    from autodiffusion_tpu.train import LossSecondMomentResampler
    s = LossSecondMomentResampler(10, history_per_term=2)
    s.update_with_local_losses(np.array([pid, pid + 5]),
                               np.array([1.0 + pid, 2.0 + pid]))
    for t in (0, 1, 5, 6):
        assert s._loss_counts[t] == 1, (t, s._loss_counts)
    barrier("end")
    print(f"RANK{pid}_OK")
""")


class TestTwoProcessDistributed:
    def test_allgather_and_sampler_across_processes(self, tmp_path):
        port = socket.socket()
        port.bind(("localhost", 0))
        addr = f"localhost:{port.getsockname()[1]}"
        port.close()

        script = tmp_path / "worker.py"
        script.write_text(WORKER)
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs = [subprocess.Popen([sys.executable, str(script), str(i), addr],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, text=True,
                                  env=env)
                 for i in range(2)]
        outs = []
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=300)
            outs.append(out)
            assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert "RANK0_OK" in outs[0] and "RANK1_OK" in outs[1]
