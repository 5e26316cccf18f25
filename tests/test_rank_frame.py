"""On-device rank/frame (ops/rank_frame.py) must produce EXACTLY the
problems and hit stats of the vectorized host formulation in
models/aligner.py collect_candidates — same ordering, budgets, dedupe
and window framing."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.utils import dna


def mk_reads(rng, text, n, with_repeats=False):
    reads = []
    for i in range(n):
        ln = int(rng.integers(40, 161))
        p = int(rng.integers(0, len(text) - ln))
        s = text[p : p + ln].copy()
        for m in rng.integers(0, ln, rng.integers(0, 3)):
            s[m] = (s[m] + 1) % 4
        if i % 2:
            s = dna.revcomp(s)
        reads.append(Read(i, f"q{i}", s,
                          rng.integers(25, 41, ln).astype(np.uint8)))
    return reads


@pytest.mark.parametrize("repeats", [False, True])
def test_fused_rank_frame_equals_host(repeats):
    rng = np.random.default_rng(17 + repeats)
    text = rng.integers(0, 4, 120_000).astype(np.int8)
    if repeats:
        unit = rng.integers(0, 4, 300).astype(np.int8)
        for p in (5000, 30000, 60000, 90000, 110000):
            text[p : p + 300] = unit
    joined, refmap = join_references(["c"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    reads = mk_reads(rng, text, 160)
    if repeats:
        reads += [Read(160 + i, f"rp{i}", unit[11 : 11 + 90].copy(),
                       np.full(90, 35, np.uint8)) for i in range(8)]

    al_f = TPUAligner(fm)
    al_h = TPUAligner(fm)
    al_h._use_fused_rank = False
    assert getattr(al_f, "_use_fused_rank", False), \
        "fused path should be active on the test backend"

    minscs = al_f.min_scores(reads)
    al_f.build_read_matrices(reads)
    al_h.build_read_matrices(reads)
    active = list(range(len(reads)))
    cf = al_f.collect_candidates(reads, minscs, active, 0)
    hn_f, he_f = al_f._hit_nonz.copy(), al_f._hit_elts.copy()
    ch = al_h.collect_candidates(reads, minscs, active, 0)
    np.testing.assert_array_equal(hn_f, al_h._hit_nonz)
    np.testing.assert_array_equal(he_f, al_h._hit_elts)
    assert len(cf) == len(ch)
    for df, dh in zip(cf, ch):
        assert set(df.keys()) == set(dh.keys())
        for k in df:
            a, b = df[k], dh[k]
            assert (a.score, a.fw, a.endj, a.problem["wstart"],
                    a.problem["wlen"], a.problem["diag"]) == \
                   (b.score, b.fw, b.endj, b.problem["wstart"],
                    b.problem["wlen"], b.problem["diag"])

    # end-to-end results identical too
    rf = al_f.align_batch(reads)
    rh = al_h.align_batch(reads)
    for a, b in zip(rf, rh):
        assert (a.status, getattr(a, "refoff", None),
                getattr(a, "score", None), getattr(a, "cigar", None)) == \
               (b.status, getattr(b, "refoff", None),
                getattr(b, "score", None), getattr(b, "cigar", None))
