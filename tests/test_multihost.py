"""Multi-host end-to-end: two real processes under jax.distributed, each
aligning its host_shard of the reads, merged into one SAM that must equal
the single-process output — the distributed analog of the reference's
thread-count output-identity requirement (scripts/sim, SURVEY §4.10)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.parallel.distributed import merge_sam_shards
from omp_bowtie2_prime_tpu.utils import dna

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
from omp_bowtie2_prime_tpu.parallel.distributed import init_distributed, host_shard
pid, nproc = int(sys.argv[1]), int(sys.argv[2])
init_distributed({coord!r}, num_processes=nproc, process_id=pid)
from omp_bowtie2_prime_tpu.index.format import FMIndex
from omp_bowtie2_prime_tpu.io.fastq import read_fastq
from omp_bowtie2_prime_tpu.io.sam import SamWriter
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.utils.cigar import cigar_string
fm = FMIndex.load({idx!r})
al = TPUAligner(fm)
reads = list(host_shard(read_fastq({fq!r}), pid, nproc, block=8))
out = open({outdir!r} + f"/shard{{pid}}.sam", "w")
w = SamWriter(out, fm.refmap.refnames, fm.refmap.reflens)
w.write_header()
for rd, res in zip(reads, al.align_batch(reads)):
    if res.status == "aligned":
        w.write_aligned(rd, res.fw, w.refnames[res.refid], res.refoff,
                        res.mapq, cigar_string(res.cigar), res.score,
                        res.secbest, res.stats)
    else:
        w.write_unaligned(rd)
out.close()
print("worker", pid, "done", len(reads))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_shard_merge(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(81)
    text = rng.integers(0, 4, 20000).astype(np.int8)
    joined, refmap = join_references(["chrH"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    idx = str(tmp_path / "h.npz")
    fm.save(idx)
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(48):
            pos = int(rng.integers(0, len(text) - 100))
            seq = text[pos : pos + 100].copy()
            if rng.integers(0, 2):
                seq = dna.revcomp(seq)
            f.write(f"@h{i}\n{dna.decode(seq)}\n+\n{'I'*100}\n")

    coord = f"localhost:{_free_port()}"
    script = _WORKER.format(repo=repo, coord=coord, idx=idx, fq=str(fq),
                            outdir=str(tmp_path))
    sp = str(tmp_path / "worker.py")
    with open(sp, "w") as f:
        f.write(script)
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, sp, str(pid), "2"], env=env,
                         cwd=repo, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out.decode()[-2000:]

    merged = tmp_path / "merged.sam"
    merge_sam_shards(
        [str(tmp_path / "shard0.sam"), str(tmp_path / "shard1.sam")],
        str(merged), block=8,
    )

    # single-process reference output
    from omp_bowtie2_prime_tpu.index.format import FMIndex
    from omp_bowtie2_prime_tpu.io.fastq import read_fastq
    from omp_bowtie2_prime_tpu.io.sam import SamWriter
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
    from omp_bowtie2_prime_tpu.utils.cigar import cigar_string

    al = TPUAligner(FMIndex.load(idx))
    reads = list(read_fastq(str(fq)))
    single = tmp_path / "single.sam"
    with open(single, "w") as out:
        w = SamWriter(out, fm.refmap.refnames, fm.refmap.reflens)
        w.write_header()
        for rd, res in zip(reads, al.align_batch(reads)):
            if res.status == "aligned":
                w.write_aligned(rd, res.fw, w.refnames[res.refid],
                                res.refoff, res.mapq,
                                cigar_string(res.cigar), res.score,
                                res.secbest, res.stats)
            else:
                w.write_unaligned(rd)

    recs = lambda p: [l for l in open(p) if not l.startswith("@")]
    assert recs(merged) == recs(single)
