"""Tranche 3 of the simple_tests.pl port: left-aligned gap placement,
exact gap-penalty budgets, and custom-policy knobs.

Source cases (scripts/test/simple_tests.pl): "Left-align insertion"
(:1075), "Left-align deletion" (:1094), "Left-align insertion with
mismatch at LHS" (:1113), "Gap penalties 1-7" (:3761-3872)."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts
from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.cigar import cigar_string
from omp_bowtie2_prime_tpu.utils.scoring import Scoring, SimpleFunc
from omp_bowtie2_prime_tpu.utils.scoring import SIMPLE_FUNC_LINEAR


def mk_aligner(ref_str, scoring=None, **opt_kw):
    joined, refmap = join_references(["t0"], [dna.encode(ref_str)])
    fm = build_index_from_text(
        joined, refmap, ftab_k=min(4, opt_kw.get("seed_len", 20))
    )
    return TPUAligner(fm, scoring=scoring, opts=AlignOpts(**opt_kw))


def mk(seq, name="r"):
    codes = dna.encode(seq)
    return Read(0, name, codes, np.full(len(codes), 40, np.uint8))


LA_REF = ("GCGATATCTACGACTGCTACGTACAAAAAAAAAAAAAA"
          "GTGTTTACGTTGCTAGACTCGATCGATCTGACAGC")


def test_left_align_insertion():
    # ref:  AC-AAAAAAAAAAAAAAGTG... ; read inserts an extra A into the
    # homopolymer: the insertion must be reported at its LEFTMOST
    # placement (2M1I40M), not mid-run (simple_tests.pl:1075-1092)
    al = mk_aligner(LA_REF, seed_len=20, norc=True)
    rd = mk("ACAAAAAAAAAAAAAAAGTGTTTACGTTGCTAGACTCGATCGA")
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert cigar_string(res.cigar) == "2M1I40M"
    assert res.score == -8  # RFG open 5 + ext 3
    assert res.stats["md"] == "42"
    assert res.stats["xo"] == 1 and res.stats["xg"] == 1
    assert res.stats["nm"] == 1


def test_left_align_deletion():
    al = mk_aligner(LA_REF, seed_len=20, norc=True)
    rd = mk("ACGTACAAAAAAAAAAAAAGTGTTTACGTTGCTAGACTCGATCGA")
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert cigar_string(res.cigar) == "6M1D39M"
    assert res.score == -8
    assert res.stats["md"] == "6^A39"


def test_left_align_deletion_with_lhs_mismatch():
    ref = ("GCGATATCTACGACTGCTACGCCCAAAAAAAAAAAAAA"
           "GTGTTTACGTTGCTAGACTCGATCGATCTGACAGC")
    al = mk_aligner(ref, seed_len=20, norc=True)
    rd = mk("TATCTACGACTGCTACGCCCTAAAAAAAAAAAAGTGTTTACGTTGCTAGACTCGATCGATCTGAC")
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert cigar_string(res.cigar) == "20M1D45M"
    assert res.stats["md"] == "20^A0A44"
    assert res.score == -14  # deletion -8 + quality-40 mismatch -6
    assert res.stats["xm"] == 1 and res.stats["xg"] == 1


def _tiny_policy(rdg, rfg):
    """MMP=C30; SEEDLEN=2; IVAL=C,1,0; MIN=L,-3,-3 (simple_tests.pl
    gap-penalty harness)."""
    sc = Scoring(
        mmp_min=30, mmp_max=30, ignore_quals=True,
        rdg_const=rdg[0], rdg_linear=rdg[1],
        rfg_const=rfg[0], rfg_linear=rfg[1],
        score_min=SimpleFunc(SIMPLE_FUNC_LINEAR, -3.0, -3.0),
    )
    return sc


def _tiny_aligner(ref, sc):
    return mk_aligner(ref, scoring=sc, seed_len=2,
                      ival=SimpleFunc.parse("C,1,0"))


def test_gap_penalty_exact_budget_read_gap():
    # budget = 3 + 12*3 = 39; RDG=29,10 -> deletion costs exactly 39
    sc = _tiny_policy(rdg=(29, 10), rfg=(25, 15))
    al = _tiny_aligner("TTGTTCGTTTGTTCGT", sc)
    res = al.align_batch([mk("TTGTTCTTTGTT")])[0]
    assert res.status == "aligned"
    assert (res.refoff, cigar_string(res.cigar)) == (0, "6M1D6M")
    assert res.score == -39
    assert res.stats["md"] == "6^G6"


def test_gap_penalty_read_gap_over_budget():
    # RDG=30,10 -> deletion costs 40 > budget 39: unaligned
    sc = _tiny_policy(rdg=(30, 10), rfg=(25, 15))
    al = _tiny_aligner("TTGTTCGTTTGTTCGT", sc)
    res = al.align_batch([mk("TTGTTCTTTGTT")])[0]
    assert res.status == "unaligned"


def test_gap_penalty_exact_budget_ref_gap():
    # budget = 3 + 14*3 = 45; RFG=30,15 -> insertion costs exactly 45
    sc = _tiny_policy(rdg=(25, 15), rfg=(30, 15))
    al = _tiny_aligner("TTGTTCGTTTGTTCGT", sc)
    res = al.align_batch([mk("TTGTTCGATTTGTT")])[0]
    assert res.status == "aligned"
    assert (res.refoff, cigar_string(res.cigar)) == (0, "7M1I6M")
    assert res.score == -45
    assert res.stats["md"] == "13"


@pytest.mark.parametrize("rfg", [(30, 16), (31, 15)])
def test_gap_penalty_ref_gap_over_budget(rfg):
    sc = _tiny_policy(rdg=(25, 15), rfg=rfg)
    al = _tiny_aligner("TTGTTCGTTTGTTCGT", sc)
    res = al.align_batch([mk("TTGTTCGATTTGTT")])[0]
    assert res.status == "unaligned"


def test_gap_penalty_both_gaps():
    # 1 read gap + 1 ref gap within budget = 3 + 18*3 = 57; RDG=19,10
    # RFG=18,10 -> costs 29 + 28 = 57 (simple_tests.pl:3854-3862)
    sc = _tiny_policy(rdg=(19, 10), rfg=(18, 10))
    al = _tiny_aligner("ATTGTTCGTTTGTTCGTA", sc)
    res = al.align_batch([mk("ATTGTTGTTTGATTCGTA")])[0]
    assert res.status == "aligned"
    assert (res.refoff, cigar_string(res.cigar)) == (0, "6M1D5M1I6M")


def test_gap_penalty_both_gaps_over_budget():
    # budget = 3 + 16*3 = 51; RDG=16,10 RFG=16,10 -> 26 + 26 = 52 > 51
    sc = _tiny_policy(rdg=(16, 10), rfg=(16, 10))
    al = _tiny_aligner("TTGTTCGTTTGTTCGT", sc)
    res = al.align_batch([mk("TTGTTGTTTGATTCGT")])[0]
    assert res.status == "unaligned"


def test_left_align_cigar_helper():
    from omp_bowtie2_prime_tpu.utils.cigar import left_align_cigar

    # ref  ACAAAAG ; read ACAAAAAG (1 insertion in the A-run): rightmost
    # placement 6M1I1M must slide to 2M1I5M
    ref = dna.encode("ACAAAAG")
    read = dna.encode("ACAAAAAG")
    out = left_align_cigar([("M", 6), ("I", 1), ("M", 1)], read, ref, 0)
    assert out == [("M", 2), ("I", 1), ("M", 5)]
    # deletion: ref ACGGGGT, read ACGGGT -> 5M1D1M slides to 2M1D4M
    ref = dna.encode("ACGGGGT")
    read = dna.encode("ACGGGT")
    out = left_align_cigar([("M", 5), ("D", 1), ("M", 1)], read, ref, 0)
    assert out == [("M", 2), ("D", 1), ("M", 4)]
    # a mismatch blocks the slide (pastMms=False)
    ref = dna.encode("ACGAAAG")
    read = dna.encode("ACTAAAAG")  # col 2 mismatches (T vs G)
    out = left_align_cigar([("M", 6), ("I", 1), ("M", 1)], read, ref, 0)
    assert out == [("M", 3), ("I", 1), ("M", 4)]  # stops at the mismatch


# ---- XS:i (second-best score) cases (simple_tests.pl :1725-2051) ------

def _xs_aligner(ref, smin="C,-6", mmp=(2, 6)):
    sc = Scoring(
        mmp_min=mmp[0], mmp_max=mmp[1],
        score_min=SimpleFunc.parse(smin),
    )
    return mk_aligner(ref, scoring=sc, seed_len=7,
                      ival=SimpleFunc.parse("C,1,0"))


def qread(seq, quals):
    codes = dna.encode(seq)
    q = np.frombuffer(quals.encode(), np.uint8).astype(np.uint8) - 33
    return Read(0, "q", codes, q)


def test_xs_equal_best_pair():
    # two placements, both one high-qual mismatch (-6): AS == XS == -6
    # (simple_tests.pl "XS:i 1")
    al = _xs_aligner("TTGTTCGATTGTTCGA")
    res = al.align_batch([mk("TTGTTCGT")])[0]
    assert res.status == "aligned"
    assert res.refoff in (0, 8)
    assert (res.score, res.secbest) == (-6, -6)
    assert res.stats["md"] == "7A0"


def test_xs_below_min_unaligned():
    # score-min C,-5 excludes both -6 placements ("XS:i 2")
    al = _xs_aligner("TTGTTCGATTGTTCGA", smin="C,-5")
    res = al.align_batch([mk("TTGTTCGT")])[0]
    assert res.status == "unaligned"


def test_xs_perfect_vs_mismatch():
    # exact at 8, mismatch -6 at 0: AS 0, XS -6 ("XS:i 3a")
    al = _xs_aligner("TTGTTCGATTGTTCGT")
    res = al.align_batch([mk("TTGTTCGT")])[0]
    assert (res.status, res.refoff) == ("aligned", 8)
    assert (res.score, res.secbest) == (0, -6)
    assert res.stats["md"] == "8"


def test_xs_quality_scaled():
    # low-qual ('A' = phred 32) mismatch costs 2+trunc(32/40*4) = 5
    # ("Q XS:i 1a"): AS == XS == -5
    al = _xs_aligner("TTGTTCGATTGTTCGA")
    res = al.align_batch([qread("TTGTTCGT", "IIIIIIIA")])[0]
    assert res.status == "aligned"
    assert (res.score, res.secbest) == (-5, -5)


def test_xs_mp_constant():
    # --mp 3,3: constant mismatch penalty 3 regardless of qual
    # ("Q XS:i 1a ! --mp 3,3")
    al = _xs_aligner("TTGTTCGATTGTTCGA", mmp=(3, 3))
    res = al.align_batch([qread("TTGTTCGT", "IIIIIII!")])[0]
    assert res.status == "aligned"
    assert (res.score, res.secbest) == (-3, -3)
