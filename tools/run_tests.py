"""Isolation-safe test runner: one pytest subprocess per test module.

Round-2 finding: a single-process full-suite run can hard-segfault inside
XLA compilation after ~100 jit compiles on this 2-CPU image (compiler-state
accumulation), silently hiding later failures. Running each tests/test_*.py
in its OWN interpreter bounds per-process compilations, makes one crash
cost one module (reported as CRASH, not silence), and caps memory growth.

  python tools/run_tests.py            # everything
  python tools/run_tests.py --fast     # -m "not slow"
  python tools/run_tests.py -k impulse # only matching modules

Exit code: 0 iff every module passed.
"""
import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help='-m "not slow"')
    ap.add_argument("-k", default="", help="module-name substring filter")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-module timeout (s)")
    args = ap.parse_args()

    modules = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if args.k:
        modules = [m for m in modules if args.k in os.path.basename(m)]
    if not modules:
        print("no test modules matched", file=sys.stderr)
        sys.exit(2)

    results = []
    t_all = time.time()
    for mod in modules:
        name = os.path.basename(mod)
        cmd = [sys.executable, "-m", "pytest", mod, "-q", "--no-header"]
        if args.fast:
            cmd += ["-m", "not slow"]
        t0 = time.time()
        try:
            out = subprocess.run(cmd, cwd=REPO, capture_output=True,
                                 text=True, timeout=args.timeout)
            rc = out.returncode
        except subprocess.TimeoutExpired:
            rc, out = -9, None
        dt = time.time() - t0
        tail = (out.stdout.strip().splitlines()[-1]
                if out and out.stdout.strip() else "")
        # pytest rc: 0 ok, 1 failures, 5 no tests collected (fine under -m)
        if rc == 0 or rc == 5:
            status = "ok"
        elif rc < 0 or rc >= 128:
            status = f"CRASH(rc={rc})"  # signal: segfault/abort/timeout
        else:
            status = f"FAIL(rc={rc})"
        results.append((name, status, dt, tail))
        print(f"{name:40s} {status:14s} {dt:7.1f}s  {tail}", flush=True)

    bad = [r for r in results if r[1] != "ok"]
    print(f"\n{len(results) - len(bad)}/{len(results)} modules ok "
          f"in {time.time() - t_all:.0f}s")
    for name, status, _, tail in bad:
        print(f"  {name}: {status}  {tail}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
