"""Long-read support (reads past l_max=160 / ALN_MAX_ROWS): the
irregular-bucket DP path with fixed length classes. The reference
rejects these reads entirely (rdlen < 256 assert, 160x200 SSE buffer,
aligner_result.h:42-43); upstream bowtie2 grows its DP rectangle —
here they route to the any-shape XLA kernel (models/aligner.py)."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.utils import dna


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    text = rng.integers(0, 4, 200000).astype(np.int8)
    joined, refmap = join_references(["chrL"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    return rng, text, TPUAligner(fm)


def mk(seq, name="r"):
    return Read(0, name, np.asarray(seq, np.int8),
                np.full(len(seq), 40, np.uint8))


def test_long_reads_align_at_truth(setup):
    rng, text, al = setup
    reads, truth = [], []
    for i, ln in enumerate([300, 500, 999, 250]):
        p = int(rng.integers(0, len(text) - ln))
        s = text[p : p + ln].copy()
        for m in rng.integers(0, ln, 3):
            s[m] = (s[m] + 1) % 4
        if i % 2:
            s = dna.revcomp(s)
        reads.append(mk(s, f"L{i}"))
        truth.append(p)
    res = al.align_batch(reads)
    for r, p in zip(res, truth):
        assert r.status == "aligned" and r.refoff == p


def test_long_read_with_gap(setup):
    rng, text, al = setup
    p = 50000
    s = text[p : p + 400].copy()
    s = np.concatenate([s[:200], s[205:]])  # 5bp deletion in the read
    res = al.align_batch([mk(s)])[0]
    assert res.status == "aligned" and res.refoff == p
    assert ("D", 5) in res.cigar


def test_past_l_hard_is_unaligned(setup):
    rng, text, al = setup
    s = text[1000 : 1000 + 1500].copy()  # > l_hard=1024
    res = al.align_batch([mk(s), mk(text[100:200].copy(), "ok")])
    assert res[0].status == "unaligned"
    assert res[1].status == "aligned" and res[1].refoff == 100


def test_mixed_lengths_one_batch(setup):
    """Short (regular Pallas bucket) and long (irregular XLA classes)
    reads in one batch — per-read results must match a separate run."""
    rng, text, al = setup
    reads = []
    for i, ln in enumerate([80, 300, 120, 500, 160, 161]):
        p = int(rng.integers(0, len(text) - ln))
        reads.append(mk(text[p : p + ln].copy(), f"m{i}"))
    both = al.align_batch(reads)
    solo = [al.align_batch([rd])[0] for rd in reads]
    for a, b in zip(both, solo):
        assert (a.status, a.refoff, a.score, a.cigar) == (
            b.status, b.refoff, b.score, b.cigar
        )


def test_long_read_deep_minsc_not_clamped(setup):
    """The -254 minsc clamp is the fork's u8 artifact; long reads (no
    fork behavior to match) keep their true score-min budget
    (L,-0.6,-0.6 at 600bp = -360), so a 600bp read with ~50 mismatches
    (score ~ -300) aligns where the clamp would reject it."""
    rng, text, al = setup
    p = 120000
    s = text[p : p + 600].copy()
    mut = np.random.default_rng(9).choice(600, 50, replace=False)
    s[mut] = (s[mut] + 1) % 4
    res = al.align_batch([mk(s, "deep")])[0]
    assert res.status == "aligned" and res.refoff == p
    assert -360 <= res.score <= -254  # below the u8 clamp, above minsc


def test_class_wider_than_batch_matrices(setup):
    """A batch whose longest read is SHORTER than its length class
    (e.g. only 300bp reads: matrices are 320 wide, class is 384) must
    pad reads/pens up to the class width — a static-width slice of
    narrower matrices would bleed penalties into read codes
    (regression: device-refs refactor, 2026-08-17)."""
    rng, text, al = setup
    p = 60001
    s = text[p : p + 300].copy()
    s[150] = (s[150] + 1) % 4  # one mismatch, qual 40 -> penalty 6
    res = al.align_batch([mk(s, "w300")])[0]
    assert res.status == "aligned"
    assert res.refoff == p
    assert res.score == -6
    assert res.cigar == [("M", 300)]
