"""Multi-host DCN execution path: 2 processes x 4 virtual devices.

The reference trains across machines via Horovod ranks (reference
bin/run_pg_learner.py:76-85). Here the equivalent is jax.distributed: both
subprocesses join one pod (gloo collectives over localhost — the CPU stand-in
for DCN), form a single 8-device global mesh, and run (a) the sharded MPPI
solve and (b) one full sharded PMC PPO train step as ONE SPMD program.
BASELINE.md scaling row: 1 chip / 1 host / N>=2 hosts — this is the N=2
harness.

Runs tools/multihost_worker.py via tools/launch_multihost.py in real
subprocesses (jax.distributed cannot be joined twice in-process).
"""
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_two_process_pod_solve_and_train():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "launch_multihost.py"),
         "-n", "2", "--devices", "4", "--",
         sys.executable, os.path.join(REPO, "tools", "multihost_worker.py")],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert out.stdout.count("MULTIHOST_OK") == 2, out.stdout[-2000:]
    assert out.stdout.count("8 global devices") == 2, out.stdout[-2000:]
    # both processes must compute the SAME psum-reduced results
    solves = [ln for ln in out.stdout.splitlines()
              if "sharded MPC solve ok" in ln]
    costs = {ln.split("best_cost=")[1] for ln in solves}
    assert len(solves) == 2 and len(costs) == 1, solves
    losses = {ln.split("loss=")[1] for ln in out.stdout.splitlines()
              if "sharded train step ok" in ln}
    assert len(losses) == 1, losses
