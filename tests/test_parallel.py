"""Multi-chip / multi-host parallelism tests (on the 8-device virtual CPU
mesh from conftest): shard-count invariance of alignment results — the
analog of the reference's single- vs multi-threaded output identity checks
(scripts/sim, SURVEY §4.10) — plus read sharding + ordered merge."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.parallel.distributed import host_shard, merge_sam_shards
from omp_bowtie2_prime_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(51)
    text = rng.integers(0, 4, 16000).astype(np.int8)
    joined, refmap = join_references(["chrM"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    reads = []
    for i in range(64):
        pos = int(rng.integers(0, len(text) - 100))
        seq = text[pos : pos + 100].copy()
        nm = int(rng.integers(0, 3))
        for _ in range(nm):
            p = int(rng.integers(5, 95))
            seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(Read(i, f"m{i}", seq.astype(np.int8),
                          rng.integers(20, 40, 100).astype(np.uint8)))
    return fm, reads


def _res_tuple(r):
    return (r.status, r.fw, r.refid, r.refoff, r.score, r.secbest, r.mapq,
            tuple(r.cigar))


def test_mesh_results_identical(setup):
    fm, reads = setup
    base = TPUAligner(fm).align_batch(reads)
    mesh = make_mesh(8)
    sharded = TPUAligner(fm, mesh=mesh).align_batch(reads)
    for a, b in zip(base, sharded):
        assert _res_tuple(a) == _res_tuple(b)


def test_host_shard_partition():
    reads = list(range(100))
    shards = [list(host_shard(iter(reads), h, 3, block=8)) for h in range(3)]
    assert sorted(x for s in shards for x in s) == reads
    # block assignment: block b -> host b % 3
    assert shards[0][:8] == list(range(8))
    assert shards[1][:8] == list(range(8, 16))
    assert shards[2][:8] == list(range(16, 24))


def test_merge_sam_shards(tmp_path):
    # 3 shards of block=2 read units each, QNAMEs r0..r9
    names = [f"r{i}" for i in range(10)]
    blocks = [names[i : i + 2] for i in range(0, 10, 2)]  # 5 blocks
    shard_names = [[], [], []]
    for b, blk in enumerate(blocks):
        shard_names[b % 3].extend(blk)
    paths = []
    for si, ns in enumerate(shard_names):
        p = tmp_path / f"s{si}.sam"
        lines = ["@HD\tVN:1.5\n"] if si == 0 else []
        if si != 0:
            lines = ["@HD\tVN:1.5\n"]
        for n in ns:
            lines.append(f"{n}\t4\t*\t0\t0\t*\t*\t0\t0\tA\tI\n")
        p.write_text("".join(lines))
        paths.append(str(p))
    out = tmp_path / "merged.sam"
    merge_sam_shards(paths, str(out), block=2)
    recs = [l.split("\t")[0] for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert recs == names
