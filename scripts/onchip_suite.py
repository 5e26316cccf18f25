"""One-shot on-chip measurement suite (run with PYTHONPATH=/root/repo
from anywhere, or from the repo root; use `timeout` — the device relay
has multi-minute hang phases): run everything in one process so a
single good tunnel window yields all numbers.

Sections (each guarded; a hang is bounded by the caller's timeout):
  1. unpaired steady-state: 3 timed 10K batches + phase timers
  2. -p2 two-worker pipeline throughput
  3. paired 10K-pair batch
  4. local mode 10K batch
Prints compact JSON-ish lines prefixed with '##' for later grepping.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_start = time.time()
import jax  # noqa: E402

print(f"## devices {jax.devices()} init={time.time()-t_start:.1f}s",
      flush=True)

import numpy as np  # noqa: E402

from omp_bowtie2_prime_tpu.index.format import FMIndex  # noqa: E402
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts  # noqa: E402
from omp_bowtie2_prime_tpu.models.paired import PairedAligner  # noqa: E402
from omp_bowtie2_prime_tpu.utils.pe import PEPolicy  # noqa: E402
from omp_bowtie2_prime_tpu.io.fastq import read_fastq  # noqa: E402

IDX = "/tmp/bt2tpu_bench_lambda_v3.npz"
if not os.path.exists(IDX):
    from omp_bowtie2_prime_tpu.index.builder import build_index
    fm = build_index("/root/reference/example/reference/lambda_virus.fa",
                     ftab_k=12)
    fm.save(IDX)
fm = FMIndex.load(IDX)
r1 = list(read_fastq("/root/reference/example/reads/reads_1.fq"))
r2 = list(read_fastq("/root/reference/example/reads/reads_2.fq"))

sections = set(sys.argv[1:]) or {"steady", "pipe", "paired", "local"}

if "steady" in sections:
    al = TPUAligner(fm)
    t0 = time.time()
    al.align_batch(r1)
    print(f"## warmup_unpaired {time.time()-t0:.1f}s", flush=True)
    al.timers.reset()
    dts = []
    for i in range(3):
        t0 = time.time()
        res = al.align_batch(r1)
        dts.append(time.time() - t0)
    naligned = sum(1 for r in res if r.status == "aligned")
    print(f"## steady_unpaired best={min(dts):.3f}s "
          f"rps={len(r1)/min(dts):.0f} aligned={naligned}", flush=True)
    al.timers.report()

if "pipe" in sections:
    from omp_bowtie2_prime_tpu.models.pipeline import run_pipeline
    from omp_bowtie2_prime_tpu.io.fastq import batch_iterator

    al1 = TPUAligner(fm)
    al2 = TPUAligner(fm)  # shares the FMIndex's device arrays
    sink = []

    def emit(batch, results):
        sink.append(len(results))

    def run_once():
        sink.clear()
        half = len(r1) // 2
        batches = [r1[:half], r1[half:]]
        return run_pipeline(iter(batches), al1.align_batch, emit,
                            align_fns=[al1.align_batch, al2.align_batch])

    t0 = time.time(); run_once(); print(f"## warmup_pipe {time.time()-t0:.1f}s", flush=True)
    dts = []
    for i in range(3):
        t0 = time.time(); n = run_once(); dts.append(time.time() - t0)
    print(f"## pipe_p2 best={min(dts):.3f}s rps={len(r1)/min(dts):.0f}",
          flush=True)

if "paired" in sections:
    alp = TPUAligner(fm)
    pal = PairedAligner(alp, PEPolicy())
    pairs = list(zip(r1, r2))
    t0 = time.time(); pal.align_pairs(pairs)
    print(f"## warmup_paired {time.time()-t0:.1f}s", flush=True)
    alp.timers.reset()
    dts = []
    for i in range(3):
        t0 = time.time(); out = pal.align_pairs(pairs); dts.append(time.time() - t0)
    ncon = sum(1 for p in out if p.cat == "concord")
    print(f"## steady_paired best={min(dts):.3f}s "
          f"pps={len(pairs)/min(dts):.0f} concord={ncon}", flush=True)
    alp.timers.report()

if "local" in sections:
    all_ = TPUAligner(fm, opts=AlignOpts(local=True))
    t0 = time.time(); all_.align_batch(r1)
    print(f"## warmup_local {time.time()-t0:.1f}s", flush=True)
    all_.timers.reset()
    dts = []
    for i in range(3):
        t0 = time.time(); res = all_.align_batch(r1); dts.append(time.time() - t0)
    nal = sum(1 for r in res if r.status == "aligned")
    print(f"## steady_local best={min(dts):.3f}s "
          f"rps={len(r1)/min(dts):.0f} aligned={nal}", flush=True)
    all_.timers.report()

print(f"## total_wall {time.time()-t_start:.1f}s", flush=True)
