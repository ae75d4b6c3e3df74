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


def _run_learner_2proc(task, extra=()):
    cmd = [sys.executable, os.path.join(REPO, "tools", "launch_multihost.py"),
           "-n", "2", "--devices", "2", "--",
           sys.executable, "-m", "lifelike_tpu.bin.run_learner",
           f"--task={task}", "--cpu", "--num_envs=8", "--total_updates=2",
           "--log_interval=1",
           "--learner_config={'unroll_length': 4, 'rollout_length': 2, "
           "'batch_windows': 2, 'num_updates': 1, 'replay_size': 8}",
           *extra]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                         cwd=REPO)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    logs = out.stdout + out.stderr
    assert logs.count("done: 2 updates") == 2, logs[-2000:]
    # SPMD parity: both processes must report the SAME update-1 loss
    losses = {ln.split("'loss': ")[1].split(",")[0]
              for ln in logs.splitlines() if "update 1: {" in ln}
    assert len(losses) == 1, losses


def test_two_process_epmc_learner():
    """Reference Horovod DP applies to every stage (run_pg_learner.py:76-85);
    the recurrent EPMC learner must train as one 2-process SPMD program."""
    _run_learner_2proc("epmc")


def test_two_process_sepmc_learner():
    """Self-play stage: 2-process SPMD training with lockstep PFSP."""
    _run_learner_2proc("sepmc", ("--update_opponent_freq=1",))


def test_two_process_kill_and_resume(tmp_path):
    """Multi-process TrainCheckpoint: per-rank shard files + commit marker
    (registry.ShardedTrainCheckpoint). Run 1 trains 2 updates and saves
    every update; run 2 (the 'restarted pod') must resume at update 2 and
    finish 4, with both ranks reporting identical post-resume losses."""
    ckpt = str(tmp_path / "train.ckpt")

    def run(total):
        cmd = [sys.executable,
               os.path.join(REPO, "tools", "launch_multihost.py"),
               "-n", "2", "--devices", "2", "--",
               sys.executable, "-m", "lifelike_tpu.bin.run_learner",
               "--task=pmc", "--cpu", "--num_envs=8",
               f"--total_updates={total}", "--log_interval=1",
               "--learner_config={'unroll_length': 4}",
               f"--train_checkpoint={ckpt}", "--save_interval=1"]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=900, cwd=REPO)
        assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
        return out.stdout + out.stderr

    logs = run(2)
    assert logs.count("done: 2 updates") == 2, logs[-2000:]
    assert os.path.exists(ckpt + ".r0") and os.path.exists(ckpt + ".r1")
    with open(ckpt + ".step") as f:
        assert int(f.read()) == 1

    logs = run(4)
    assert logs.count("at update 2") == 2, logs[-2000:]
    assert logs.count("done: 4 updates") == 2, logs[-2000:]
    losses = {ln.split("'loss': ")[1].split(",")[0]
              for ln in logs.splitlines() if "update 3: {" in ln}
    assert len(losses) == 1, losses


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
