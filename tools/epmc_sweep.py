"""EPMC fused-solve latency sweep on the real chip (VERDICT r4 item 3).

Runs bench.bench_epmc over a (contact_k, bs_tile) grid with short chains and
prints one JSON line per config — the measurement loop for driving the
pop-4096 H=50 EPMC solve under the 10 ms budget. Run ONLY when nothing else
holds the TPU tunnel (single-tenant).

  python tools/epmc_sweep.py --ks 16,12,8 --tiles 0,4,8,16
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="16,8")
    ap.add_argument("--tiles", default="0,8")
    ap.add_argument("--pop", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--substeps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--m_hi", type=int, default=8)
    args = ap.parse_args()

    for k in (int(x) for x in args.ks.split(",")):
        for tile in (int(x) for x in args.tiles.split(",")):
            name, ms = bench.bench_epmc(
                args.pop, args.horizon, args.substeps, args.reps, args.m_hi,
                mass_freeze=args.substeps, contact_k=k, fused=True,
                bs_tile=tile or None,
            )
            print(json.dumps({
                "metric": name, "contact_k": k, "bs_tile": tile or "default",
                "value": round(ms, 3), "unit": "ms",
            }), flush=True)


if __name__ == "__main__":
    main()
