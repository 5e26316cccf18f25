#!/usr/bin/env python3
"""2.3 Gbp blockwise build under a stated memory cap, with an auditable
RSS trace (VERDICT r4 item 4).

The reference's whole reason for the blockwise builder is the bounded-
memory contract (--bmax/--bmaxdivn, blockwise_sa.h:255+,
bt2_idx.h:2922-3290): the peak RSS must be a *chosen* number, not a
consequence of n. This driver runs build_index_blockwise on a synthetic
2.3 Gbp genome at a bmax picked for a <=16 GB peak, samples RSS every
15 s to a log file, and records ru_maxrss at the end.

Usage:
  PYTHONPATH=/root/repo python scripts/bigbuild.py \
      [--size 2300000000] [--bmax 45000000] [--dcv 1024] \
      [--workdir /tmp/bigbuild] [--save]
"""

import argparse
import json
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / (1 << 20)
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2_300_000_000)
    ap.add_argument("--bmax", type=int, default=45_000_000)
    ap.add_argument("--dcv", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/bigbuild")
    ap.add_argument("--workers", type=int, default=1,
                    help="concurrent sort buffers; on a 1-core host >1 "
                         "buys no speed and multiplies the O(bmax) "
                         "in-flight memory")
    ap.add_argument("--save", action="store_true",
                    help="save the final index as idx.npz (adds the"
                         " serialization copy to the footprint)")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    log_path = os.path.join(args.workdir, "rss_trace.jsonl")
    logf = open(log_path, "a", buffering=1)
    t0 = time.time()
    state = {"phase": "synth", "blocks": 0, "rows": 0}

    def trace():
        peak = 0.0
        while not state.get("done"):
            r = rss_gb()
            peak = max(peak, r)
            logf.write(json.dumps({
                "t": round(time.time() - t0, 1), "rss_gb": round(r, 2),
                "peak_gb": round(peak, 2), **{k: state[k] for k in
                                              ("phase", "blocks", "rows")},
            }) + "\n")
            time.sleep(15)

    threading.Thread(target=trace, daemon=True).start()

    from omp_bowtie2_prime_tpu.index import blockwise
    from omp_bowtie2_prime_tpu.index.fasta import join_references

    rng = np.random.default_rng(args.seed)
    text = rng.integers(0, 4, args.size, dtype=np.int8)
    joined, refmap = join_references(["synth2300M"], [text])
    del text  # join_references copies; one resident text only
    state["phase"] = "build"

    # instrument block progress without touching builder internals:
    # wrap the block generator
    real_blocks = blockwise.sa_blocks

    def counted_blocks(*a, **kw):
        for blk in real_blocks(*a, **kw):
            state["blocks"] += 1
            state["rows"] += len(blk)
            yield blk

    blockwise.sa_blocks = counted_blocks
    fm = blockwise.build_index_blockwise(
        joined, refmap, bmax=args.bmax, dcv=args.dcv,
        workers=args.workers)
    state["phase"] = "done-assembly"
    wall = time.time() - t0
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    rec = {
        "event": "bigbuild", "n": int(fm.n), "zoff": int(fm.zoff),
        "sa_sample_rows": int(len(fm.sa_sample)),
        "bmax": args.bmax, "dcv": args.dcv,
        "wall_s": round(wall, 1), "peak_rss_gb": round(peak, 2),
        "blocks": state["blocks"],
    }
    print(json.dumps(rec), flush=True)
    logf.write(json.dumps(rec) + "\n")
    if args.save:
        fm.save(os.path.join(args.workdir, "idx2300M.npz"))
        rec["saved"] = True
        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
        rec["peak_rss_gb_after_save"] = round(peak, 2)
        print(json.dumps(rec), flush=True)
    state["done"] = True


if __name__ == "__main__":
    main()
