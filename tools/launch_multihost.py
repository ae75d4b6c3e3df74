"""Spawn an N-process multi-host run on one machine (DCN-over-localhost).

Each child gets the LIFELIKE_* env contract consumed by
lifelike_tpu.parallel.distributed.initialize: coordinator address, process
count/id and (CPU rigs) per-process virtual device count. This is the
TPU-native analogue of the reference's 4-terminal Horovod launch recipe
(reference train_scripts/example_pmc_train.sh:1-6, bin/run_pg_learner.py:76-85)
— except the workers form ONE SPMD program instead of rank-sharded learners.

    python tools/launch_multihost.py -n 2 --devices 4 -- \
        python tools/multihost_worker.py
    python tools/launch_multihost.py -n 2 -- \
        python -m lifelike_tpu.bin.run_learner --task=pmc --cpu ...

Exit code is nonzero if any child fails.
"""
import argparse
import os
import re
import socket
import subprocess
import sys


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--num_processes", type=int, default=2)
    ap.add_argument("--devices", type=int, default=4,
                    help="virtual CPU devices per process (CPU rigs)")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the worker command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("worker command required after --")

    port = args.port or free_port()
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        # a parent pytest/driver may have pinned its own virtual device
        # count; children get exactly --devices each
        env["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            env.get("XLA_FLAGS", ""),
        )
        env.update(
            LIFELIKE_COORDINATOR=f"127.0.0.1:{port}",
            LIFELIKE_NUM_PROCESSES=str(args.num_processes),
            LIFELIKE_PROCESS_ID=str(pid),
            LIFELIKE_LOCAL_DEVICES=str(args.devices),
        )
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait() for p in procs]
    if any(rcs):
        print(f"launch_multihost: child exit codes {rcs}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
