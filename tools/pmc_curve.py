"""From-scratch PMC training evidence: reward curve + checkpoint eval table.

The reference's central deliverable is trained controllers
(/root/reference/train_scripts/example_pmc_train.sh is a complete recipe);
the framework must demonstrate that its own learner moves the policy, not
just that losses compute. This tool turns a bin/run_learner PMC run into
committed evidence:

  1. parse the learner log (reward_mean / return / perplexity / VQ loss
     per logged update) into a downsampled curve table;
  2. eval three policies on the SAME tracking env via bin/run_eval
     (argmax actions, N episodes): the run's latest pool checkpoint, a
     RANDOM-init policy (floor), and the imported reference
     primitive_level.model (ceiling);
  3. append a "From-scratch PMC training" section to EVAL.md.

  python tools/pmc_curve.py --run_dir runs/pmc_r5 [--episodes 5]
"""
import argparse
import glob
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
IMPORTED = "/root/reference/data/models/primitive_level.model"


def parse_log(path):
    """[(update, reward_mean, ret, perplexity, e_latent_loss, steps_s)]"""
    rows = []
    pat = re.compile(
        r"update (\d+): .*'e_latent_loss': ([-\w.]+).*'perplexity': "
        r"([-\w.]+).*'return': ([-\w.]+).*'reward_mean': ([-\w.]+).*"
        r"env steps/s (\d+)"
    )
    for ln in open(path):
        m = pat.search(ln)
        if m:
            try:
                rows.append((int(m.group(1)), float(m.group(5)),
                             float(m.group(4)), float(m.group(3)),
                             float(m.group(2)), int(m.group(6))))
            except ValueError:
                pass  # nan rows
    # a resumed run re-logs earlier updates; keep the LAST occurrence
    by_update = {}
    for r in rows:
        by_update[r[0]] = r
    return [by_update[k] for k in sorted(by_update)]


def eval_policy(model_path, episodes, max_steps, seed=0):
    """(rewards, lens) per episode from bin/run_eval --task=pmc."""
    cmd = [sys.executable, "-m", "lifelike_tpu.bin.run_eval", "--task=pmc",
           "--cpu", f"--episodes={episodes}", f"--max_steps={max_steps}",
           f"--seed={seed}"]
    if model_path:
        cmd.append(f"--model_path={model_path}")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=7200,
                         cwd=REPO)
    rews, lens = [], []
    for ln in out.stderr.splitlines():
        m = re.search(r"episode \d+: reward_sum ([-\d.]+) len (\d+)", ln)
        if m:
            rews.append(float(m.group(1)))
            lens.append(int(m.group(2)))
    return rews, lens, out.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default=os.path.join(REPO, "runs/pmc_r5"))
    ap.add_argument("--episodes", type=int, default=5)
    ap.add_argument("--max_steps", type=int, default=400)
    ap.add_argument("--points", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL.md"))
    ap.add_argument("--no_eval", action="store_true")
    args = ap.parse_args()

    rows = parse_log(os.path.join(args.run_dir, "train.log"))
    assert rows, "no parseable updates in the log"
    idx = np.unique(np.linspace(0, len(rows) - 1, args.points).astype(int))
    lines = [
        "",
        "## 4. From-scratch PMC training (bin/run_learner on the TPU)",
        "",
        f"Reference recipe hyperparameters (train_scripts/pmc_train.sh: "
        f"lr 1e-5, gamma=lam=0.95, clip 0.1, 256 envs x 128-step unrolls = "
        f"32768 env steps/update), prioritized clip resampling, f32 with "
        f"`--matmul_precision=highest`. {rows[-1][0] + 1} updates = "
        f"{(rows[-1][0] + 1) * 32768 / 1e6:.0f}M env steps.",
        "",
        "| update | reward/step | return | VQ perplexity | e_latent | "
        "env steps/s |",
        "|---|---|---|---|---|---|",
    ]
    for i in idx:
        u, rm, ret, per, el, sps = rows[i]
        lines.append(f"| {u} | {rm:.3f} | {ret:.3f} | {per:.1f} | {el:.3f} "
                     f"| {sps} |")

    if not args.no_eval:
        pool = sorted(glob.glob(os.path.join(args.run_dir, "pool",
                                             "*.model")))
        assert pool, f"no pool checkpoints in {args.run_dir}/pool"
        trained = pool[-1]
        lines += [
            "",
            f"Held-out eval: same tracking env (argmax actions, "
            f"{args.episodes} episodes x {args.max_steps} cap, random "
            f"clips/offsets per reset). Random init is the floor, the "
            f"imported reference PMC the ceiling.",
            "",
            "| policy | reward sum mean+-std | episode len mean |",
            "|---|---|---|",
        ]
        for name, path in (
            ("random init", ""),
            (f"trained ({os.path.basename(trained)})", trained),
            ("imported primitive_level.model", IMPORTED),
        ):
            rews, lens, rc = eval_policy(path, args.episodes, args.max_steps)
            if rews:
                lines.append(
                    f"| {name} | {np.mean(rews):.2f}+-{np.std(rews):.2f} | "
                    f"{np.mean(lens):.0f} |"
                )
            else:
                lines.append(f"| {name} | rc={rc} | |")
            print(f"  {name}: {[round(r, 2) for r in rews]}", flush=True)

    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended PMC training section to {args.out}")


if __name__ == "__main__":
    main()
