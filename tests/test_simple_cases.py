"""Table-driven functional cases — the pytest port of the reference's
simple_tests.pl strategy (scripts/test/simple_tests.pl: hand-written
{ref, reads, args, expected pos/CIGAR/MAPQ/flags} hashes): each case is a
tiny reference plus reads with exactly-known alignments."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts
from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.cigar import cigar_string

# A fixed 400bp reference with a known sequence (deterministic, seeded)
_RNG = np.random.default_rng(1234)
REF = _RNG.integers(0, 4, 400).astype(np.int8)
REF_S = dna.decode(REF)


@pytest.fixture(scope="module")
def al():
    joined, refmap = join_references(["t0"], [REF.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    return TPUAligner(fm, opts=AlignOpts(seed_len=20))


def sub(s, p, c):
    out = list(s)
    out[p] = c
    return "".join(out)


def mk(seq, q=None, name="r"):
    codes = dna.encode(seq)
    if q is None:
        qual = np.full(len(codes), 40, np.uint8)
    else:
        qual = np.asarray(q, np.uint8)
    return Read(0, name, codes, qual)


# (read builder, expected dict) — None field = don't check
CASES = [
    # exact forward match
    (lambda: mk(REF_S[100:180]),
     dict(pos=100, fw=True, cigar="80M", score=0, mapq=42)),
    # exact reverse-complement match
    (lambda: mk(dna.decode(dna.revcomp(REF[40:140])))
     , dict(pos=40, fw=False, cigar="100M", score=0)),
    # single high-quality mismatch: penalty MX=6
    (lambda: mk(sub(REF_S[200:280], 40, "ACGT"[(REF[240] + 1) % 4])),
     dict(pos=200, cigar="80M", score=-6)),
    # single LOW-quality mismatch: penalty MN+floor = 2 at qual 0
    (lambda: mk(sub(REF_S[200:280], 40, "ACGT"[(REF[240] + 1) % 4]),
                q=np.r_[np.full(40, 40), [0], np.full(39, 40)]),
     dict(pos=200, cigar="80M", score=-2)),
    # 2bp deletion from the read (CIGAR D): open 5 + 2*ext 3 = -11
    (lambda: mk(REF_S[50:90] + REF_S[92:132]),
     dict(pos=50, cigar="40M2D40M", score=-11)),
    # 1bp insertion into the read (CIGAR I): open 5 + ext 3 = -8
    (lambda: mk(REF_S[300:340] + "A" + REF_S[340:379])
     if REF[340] != 0 else
     (lambda: mk(REF_S[300:340] + "C" + REF_S[340:379]))(),
     dict(pos=300, score=-8)),
    # N in the read: -1 penalty, MD counts it as mismatch
    (lambda: mk(REF_S[10:90][:40] + "N" + REF_S[51:90]),
     dict(pos=10, cigar="80M", score=-1)),
    # read that doesn't occur: unaligned
    (lambda: mk("".join("ACGT"[c] for c in _RNG.integers(0, 4, 60))),
     dict(unaligned=True)),
]


@pytest.mark.parametrize("case_i", range(len(CASES)))
def test_simple_case(al, case_i):
    build, exp = CASES[case_i]
    rd = build()
    res = al.align_batch([rd])[0]
    if exp.get("unaligned"):
        assert res.status == "unaligned"
        return
    assert res.status == "aligned", f"case {case_i} failed to align"
    if "pos" in exp:
        assert res.refoff == exp["pos"], f"case {case_i}"
    if "fw" in exp:
        assert res.fw == exp["fw"]
    if "cigar" in exp:
        assert cigar_string(res.cigar) == exp["cigar"], f"case {case_i}"
    if "score" in exp:
        assert res.score == exp["score"], f"case {case_i}"
    if "mapq" in exp:
        assert res.mapq == exp["mapq"]


def test_min_score_boundary():
    """--score-min boundary: with score-min C,-12, two high-qual
    mismatches (-12) pass and three (-18) fail (mismatches spaced so
    exact 20-mers still seed the read)."""
    from omp_bowtie2_prime_tpu.utils.scoring import (
        Scoring, SimpleFunc, SIMPLE_FUNC_CONST,
    )

    joined, refmap = join_references(["t0"], [REF.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    sc = Scoring(score_min=SimpleFunc(SIMPLE_FUNC_CONST, -12.0, 0.0))
    al2 = TPUAligner(fm, sc, AlignOpts(seed_len=20))
    base = REF_S[100:180]
    seq2 = base
    for p in (5, 40):
        seq2 = sub(seq2, p, "ACGT"[(REF[100 + p] + 1) % 4])
    res = al2.align_batch([mk(seq2)])[0]
    assert res.status == "aligned" and res.score == -12
    seq3 = sub(seq2, 75, "ACGT"[(REF[175] + 1) % 4])
    res = al2.align_batch([mk(seq3)])[0]
    assert res.status == "unaligned"


def test_md_and_nm_tags(al):
    seq = sub(REF_S[100:180], 40, "ACGT"[(REF[140] + 1) % 4])
    res = al.align_batch([mk(seq)])[0]
    assert res.stats["nm"] == 1 and res.stats["xm"] == 1
    refc = "ACGT"[REF[140]]
    assert res.stats["md"] == f"40{refc}39"


# ---------------- tranche 2 (simple_tests.pl breadth) ----------------

CASES2 = [
    # 2bp insertion into the read: open 5 + 2*ext 3 = -11
    (lambda: mk(REF_S[60:100] + "AC" + REF_S[100:138]),
     dict(pos=60, score=-11, cigar="40M2I38M")),
    # long (8bp) deletion: -5-24 = -29, within minsc(-0.6-0.6*80=-48)
    (lambda: mk(REF_S[120:160] + REF_S[168:208]),
     dict(pos=120, score=-29, cigar="40M8D40M")),
    # two mismatches far apart: MD run arithmetic
    (lambda: mk(sub(sub(REF_S[20:100], 10, "ACGT"[(REF[30] + 1) % 4]),
                    70, "ACGT"[(REF[90] + 1) % 4])),
     dict(pos=20, score=-12, cigar="80M")),
]


@pytest.mark.parametrize("case_i", range(len(CASES2)))
def test_simple_case_t2(al, case_i):
    build, exp = CASES2[case_i]
    res = al.align_batch([build()])[0]
    assert res.status == "aligned", f"t2 case {case_i}"
    assert res.refoff == exp["pos"]
    assert res.score == exp["score"]
    if "cigar" in exp:
        assert cigar_string(res.cigar) == exp["cigar"]


def test_gap_barrier_vetoes_end_gaps(al):
    """gGapBarrier=4: a deletion 2bp from the read start cannot be a gap
    (scoring.h gap barrier); the aligner must charge mismatches instead
    or place the read elsewhere — never emit D/I within 4bp of an end."""
    seq = REF_S[200:202] + REF_S[204:280]  # 2bp del after 2 read chars
    res = al.align_batch([mk(seq)])[0]
    if res.status == "aligned":
        ops = res.cigar
        # no gap op within gbar of either end
        lead = 0
        for op, ln in ops:
            if op in "DI":
                assert lead >= 4, f"gap at read offset {lead}"
            if op in "MI":
                lead += ln


def test_n_heavy_reads_follow_fork_semantics(al):
    """The fork BYPASSES the up-front N filter for every rdlen<256 read
    (filt = rdlen<256 short-circuit, bt2_search.cpp:2495-2524 — hence
    its YF:Z:LN on all records), but its BACKTRACE rejects alignments
    with more than nCeil Ns (score.ns_ > nceil_,
    aligner_swsse_ee_u8.cpp:1284). Verified against bowtie2-align-s:
    nceil(80) = trunc(0 + 0.15*80) = 12, so 12 Ns align (AS = -12, one
    npen each) and 13 Ns do not."""
    base = REF_S[100:180]
    at_cap = "N" * 12 + base[12:]
    res = al.align_batch([mk(at_cap, name="b12")])[0]
    assert res.status == "aligned" and res.refoff == 100
    assert res.score == -12  # one npen per N
    over = "N" * 13 + base[13:]
    res = al.align_batch([mk(over, name="b13")])[0]
    assert res.status == "unaligned"


def test_norc_nofw_orientation_gates():
    joined, refmap = join_references(["t0"], [REF.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    rc_read = mk(dna.decode(dna.revcomp(REF[40:140])))
    fw_read = mk(REF_S[40:140])
    al_norc = TPUAligner(fm, opts=AlignOpts(seed_len=20, norc=True))
    assert al_norc.align_batch([rc_read])[0].status == "unaligned"
    assert al_norc.align_batch([fw_read])[0].status == "aligned"
    al_nofw = TPUAligner(fm, opts=AlignOpts(seed_len=20, nofw=True))
    assert al_nofw.align_batch([fw_read])[0].status == "unaligned"
    assert al_nofw.align_batch([rc_read])[0].status == "aligned"


def test_paired_fr_simple():
    """Concordant FR pair at known positions: flags, TLEN arithmetic."""
    from omp_bowtie2_prime_tpu.models.paired import PairedAligner
    from omp_bowtie2_prime_tpu.utils.pe import PEPolicy, policy_from_flags

    big = np.concatenate([REF, REF[::-1], REF])  # 1200bp
    joined, refmap = join_references(["t0"], [big.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    al2 = TPUAligner(fm, opts=AlignOpts(seed_len=20))
    pe = PEPolicy(pol=policy_from_flags(True, False), minfrag=0, maxfrag=400)
    pal = PairedAligner(al2, pe)
    p, frag, rl = 150, 300, 80
    m1 = Read(0, "p", big[p : p + rl].copy(), np.full(rl, 40, np.uint8))
    m2 = Read(0, "p", dna.revcomp(big[p + frag - rl : p + frag].copy()),
              np.full(rl, 40, np.uint8))
    r = pal.align_pairs([(m1, m2)])[0]
    assert r.cat == "concord"
    assert r.m1.refoff == p and r.m2.refoff == p + frag - rl
    assert r.tlen1 == frag and r.tlen2 == -frag
    assert r.m1.fw and not r.m2.fw
