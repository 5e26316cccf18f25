"""End-to-end aligner tests on a synthetic genome.

Mirrors the reference's randomized-sim strategy (scripts/sim/, SURVEY §4):
simulate reads with known placements/mutations, align, verify placements
and SAM self-consistency (AlignmentCheck.pm analog in utils/samcheck).
"""

import io

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.io.sam import SamWriter
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts
from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.cigar import cigar_string
from omp_bowtie2_prime_tpu.utils.samcheck import check_sam


@pytest.fixture(scope="module")
def genome_and_aligner():
    rng = np.random.default_rng(7)
    text = rng.integers(0, 4, 20000).astype(np.int8)
    joined, refmap = join_references(["chr_t"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    al = TPUAligner(fm)
    return text, fm, al


def simulate(text, rng, n, ln=100, mut=True):
    reads, truth = [], []
    for i in range(n):
        pos = int(rng.integers(0, len(text) - ln))
        seq = text[pos : pos + ln].copy()
        fw = bool(rng.integers(0, 2))
        nmut = int(rng.integers(0, 4)) if mut else 0
        for _ in range(nmut):
            p = int(rng.integers(5, ln - 5))
            seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
        if not fw:
            seq = dna.revcomp(seq)
        qual = rng.integers(20, 40, ln).astype(np.uint8)
        reads.append(Read(i, f"sim{i}", seq.astype(np.int8), qual))
        truth.append((pos, fw))
    return reads, truth


def test_exact_reads_align_to_truth(genome_and_aligner):
    text, fm, al = genome_and_aligner
    rng = np.random.default_rng(1)
    reads, truth = simulate(text, rng, 40, mut=False)
    res = al.align_batch(reads)
    for r, (pos, fw) in zip(res, truth):
        assert r.status == "aligned"
        assert r.score == 0
        assert (r.refoff, r.fw) == (pos, fw)
        assert r.cigar == [("M", len(reads[0].seq))]


def test_mutated_reads_mostly_align(genome_and_aligner):
    text, fm, al = genome_and_aligner
    rng = np.random.default_rng(2)
    reads, truth = simulate(text, rng, 60, mut=True)
    res = al.align_batch(reads)
    nok = sum(
        1
        for r, (pos, fw) in zip(res, truth)
        if r.status == "aligned" and r.refoff == pos and r.fw == fw
    )
    assert nok >= 55  # a few heavily-mutated reads may legitimately miss


def test_indel_read(genome_and_aligner):
    text, fm, al = genome_and_aligner
    pos = 5000
    seq = np.concatenate([text[pos : pos + 50], text[pos + 53 : pos + 103]])
    rd = Read(0, "del3", seq.astype(np.int8), np.full(100, 35, np.uint8))
    r = al.align_batch([rd])[0]
    assert r.status == "aligned"
    assert r.refoff == pos
    assert ("D", 3) in r.cigar
    assert r.score == -(5 + 3 * 3)  # read gap open + 3 extends


def test_sam_output_self_consistent(genome_and_aligner, tmp_path):
    text, fm, al = genome_and_aligner
    rng = np.random.default_rng(3)
    reads, _ = simulate(text, rng, 50, mut=True)
    buf = io.StringIO()
    w = SamWriter(buf, fm.refmap.refnames, fm.refmap.reflens)
    w.write_header()
    for rd, res in zip(reads, al.align_batch(reads)):
        if res.status == "aligned":
            w.write_aligned(
                rd, res.fw, fm.refmap.refnames[res.refid], res.refoff,
                res.mapq, cigar_string(res.cigar), res.score, res.secbest, res.stats,
            )
        else:
            w.write_unaligned(rd)
    p = tmp_path / "out.sam"
    p.write_text(buf.getvalue())
    n, clean, kinds = check_sam(str(p), {"chr_t": text})
    assert n > 0
    assert clean == n, kinds


def test_unaligned_for_random_reads(genome_and_aligner):
    text, fm, al = genome_and_aligner
    rng = np.random.default_rng(4)
    reads = [
        Read(i, f"rnd{i}", rng.integers(0, 4, 100).astype(np.int8),
             np.full(100, 30, np.uint8))
        for i in range(8)
    ]
    res = al.align_batch(reads)
    assert sum(1 for r in res if r.status == "unaligned") >= 7
