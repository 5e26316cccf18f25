"""Streaming shard merge + periodic --met emission (VERDICT r1 items
5/9) and the meta-only seed instantiation used by the fused device
path."""

import time

import numpy as np

from omp_bowtie2_prime_tpu.parallel.distributed import (
    host_shard, merge_sam_shards,
)
from omp_bowtie2_prime_tpu.utils.metrics import (
    PeriodicMetrics, PipelineMetrics,
)


class _R:
    def __init__(self, i):
        self.i = i


def _unit(name, nrec):
    return [f"{name}\t0\tc\t{i+1}\t42\t5M\t*\t0\t0\tACGTA\tIIIII\n"
            for i in range(nrec)]


def test_streaming_merge_matches_input_order(tmp_path):
    """3 shards produced by host_shard block assignment (block=4, uneven
    tail, multi-record units) merge back into exact input order."""
    n_units = 37
    block = 4
    names = [f"q{i:03d}" for i in range(n_units)]
    shards = [[], [], []]
    for b in range((n_units + block - 1) // block):
        dst = b % 3
        for name in names[b * block : (b + 1) * block]:
            # mates/secondaries: multi-line units must stay together
            shards[dst].extend(_unit(name, 1 + (hash(name) % 3)))
    paths = []
    for s, lines in enumerate(shards):
        p = tmp_path / f"shard{s}.sam"
        with open(p, "w") as f:
            if s == 0:
                f.write("@HD\tVN:1.0\n@SQ\tSN:c\tLN:100\n")
            f.writelines(lines)
        paths.append(str(p))
    out = tmp_path / "merged.sam"
    merge_sam_shards(paths, str(out), block=block)
    got = [l for l in open(out) if not l.startswith("@")]
    want = []
    for name in names:
        want.extend(_unit(name, 1 + (hash(name) % 3)))
    assert got == want
    assert open(out).readline().startswith("@HD")


def test_host_shard_roundtrip_with_merge(tmp_path):
    reads = [_R(i) for i in range(101)]
    parts = [list(host_shard(iter(reads), pid, 3, block=8))
             for pid in range(3)]
    assert sum(len(p) for p in parts) == 101
    # block b goes to host b%3
    assert [r.i for r in parts[0]][:8] == list(range(8))
    assert [r.i for r in parts[1]][:8] == list(range(8, 16))


def test_periodic_metrics_emits_during_run(tmp_path):
    m = PipelineMetrics()
    p = tmp_path / "met.txt"
    em = PeriodicMetrics([m], interval=0.3, path=str(p)).start()
    for i in range(4):
        m.add(reads=100)
        time.sleep(0.35)
    em.stop()
    lines = open(p).read().splitlines()
    # at least 3 in-flight lines plus the final one; counters cumulative
    assert len(lines) >= 4
    assert all(l.startswith("Metrics: elapsed=") for l in lines)
    assert "reads=400" in lines[-1]


def test_seed_meta_matches_materialized_seeds():
    """_instantiate_seeds_meta must emit the same (ri, fw, off) multiset
    as _instantiate_seeds for every round (the fused device path builds
    windows from these on device)."""
    from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
    from omp_bowtie2_prime_tpu.index.fasta import join_references
    from omp_bowtie2_prime_tpu.io.fastq import Read
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner

    rng = np.random.default_rng(5)
    text = rng.integers(0, 4, 4000).astype(np.int8)
    joined, refmap = join_references(["c"], [text])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    al = TPUAligner(fm)
    reads = []
    for i, ln in enumerate([21, 22, 36, 50, 100, 151, 220]):
        pos = int(rng.integers(0, len(text) - ln))
        reads.append(Read(rdid=i, name=f"s{i}",
                          seq=text[pos : pos + ln].copy(),
                          qual=np.full(ln, 30, np.uint8)))
    al.build_read_matrices(reads)
    for roundi in (0, 1):
        seeds, (ri, fw, off) = al._instantiate_seeds(
            reads, range(len(reads)), roundi
        )
        mri, mfw, moff, meff = al._instantiate_seeds_meta(
            range(len(reads)), roundi
        )
        a = sorted(zip(ri.tolist(), fw.tolist(), off.tolist()))
        b = sorted(zip(mri.tolist(), mfw.tolist(), moff.tolist()))
        assert a == b
        # windows gathered from the matrix rows match the seed arrays;
        # seeds shorter than seed_len (min(seed_len, rdlen) clamp) are
        # right-aligned with -1 padding (layout contract in
        # ops/seed_search.py search_seeds)
        for k in range(len(mri)):
            src = 2 * int(mri[k]) + (0 if mfw[k] else 1)
            eff = min(22, int(al._mat_lens[int(mri[k])]))
            w = np.full(22, -1, np.int8)
            w[22 - eff:] = al._mat_reads[
                src, int(moff[k]) : int(moff[k]) + eff
            ]
            match = [
                t for t in range(len(ri))
                if (ri[t], fw[t], off[t]) == (mri[k], mfw[k], moff[k])
            ]
            assert np.array_equal(seeds[match[0]], w)
