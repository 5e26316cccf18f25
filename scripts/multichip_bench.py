#!/usr/bin/env python3
"""Virtual-mesh throughput + identity measurement (VERDICT r1 item 7).

Runs the FULL align_batch pipeline on an N-device virtual CPU mesh vs a
single device: asserts bitwise-identical results and reports reads/s for
both. On CPU the mesh cannot speed anything up (same cores under the
shards) — the point is that the mesh path is first-class: the fused
rank/frame mega, the device-resident packed read matrix, and index-only
DP dispatch all run UNDER the mesh, and the figure proves the sharded
executables execute end-to-end, not just compile.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/multichip_bench.py [ndev] [nreads]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    ndev = int(pos[0]) if len(pos) > 0 else 8
    nreads = int(pos[1]) if len(pos) > 1 else 20000
    idx_path = next((a.split("=", 1)[1] for a in sys.argv
                     if a.startswith("--idx=")), None)
    text_path = next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--text=")), None)

    from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
    from omp_bowtie2_prime_tpu.index.fasta import join_references
    from omp_bowtie2_prime_tpu.io.fastq import Read
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
    from omp_bowtie2_prime_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    if idx_path:
        # genome-scale mode (VERDICT r4 item 3): load a prebuilt index
        # (e.g. /tmp/bt2prof/idx46M.npz) + its text for read synthesis
        from omp_bowtie2_prime_tpu.index.format import FMIndex

        fm = FMIndex.load(idx_path)
        text = np.load(text_path)
        print(f"loaded {idx_path}: n={fm.n}", flush=True)
    else:
        text = rng.integers(0, 4, 4_600_000).astype(np.int8)
        joined, rm = join_references(["c"], [text])
        fm = build_index_from_text(joined, rm)
    reads = []
    for i in range(nreads):
        pos = int(rng.integers(0, len(text) - 100))
        seq = text[pos : pos + 100].copy()
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, 100))
            seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(Read(i, f"r{i}", seq, np.full(100, 35, np.uint8)))

    def run(al):
        al.align_batch(reads[:256])  # warm compile
        t0 = time.time()
        res = al.align_batch(reads)
        return res, time.time() - t0

    res1, dt1 = run(TPUAligner(fm))
    resN, dtN = run(TPUAligner(fm, mesh=make_mesh(ndev)))
    key = lambda r: (r.status, r.fw, r.refid, r.refoff, r.score,
                     r.secbest, r.mapq, tuple(r.cigar or []))
    ident = all(key(a) == key(b) for a, b in zip(res1, resN))
    print(f"1-device:  {nreads/dt1:8.0f} reads/s ({dt1:.2f}s)")
    print(f"{ndev}-device: {nreads/dtN:8.0f} reads/s ({dtN:.2f}s)")
    print(f"identity: {'BITWISE-IDENTICAL' if ident else 'MISMATCH'}")
    ident_tp = True
    if "--tp" in sys.argv:
        # tensor-parallel index: FM blocks + SA sample sharded row-wise
        # over a 'model' axis (parallel/tp_index.py), rank gathers
        # recombined by one psum per step
        import jax
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[:ndev])
        tp_mesh = Mesh(devs.reshape(1, ndev), ("data", "model"))
        alT = TPUAligner(fm, mesh=tp_mesh)
        from omp_bowtie2_prime_tpu.parallel.tp_index import (
            tp_hbm_per_device,
        )

        hbm = tp_hbm_per_device(alT.idx, ndev)
        print(f"tp-index bytes/device: sharded "
              f"{hbm['tp_sharded']/1e6:.1f} MB vs replicated "
              f"{hbm['replicated']/1e6:.1f} MB "
              f"({ndev}-way)", flush=True)
        resT, dtT = run(alT)
        ident_tp = all(key(a) == key(b) for a, b in zip(res1, resT))
        print(f"tp-index {ndev}-way: {nreads/dtT:8.0f} reads/s "
              f"({dtT:.2f}s)")
        print(f"tp identity: "
              f"{'BITWISE-IDENTICAL' if ident_tp else 'MISMATCH'}")
    sys.exit(0 if (ident and ident_tp) else 1)


if __name__ == "__main__":
    main()
