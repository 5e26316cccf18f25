"""Reads aligning ACROSS reference N runs (the "N-bridge" DP path).

The reference's DP windows come from BitPairReference::getStretch, which
decodes N-gap positions as code 4 (reference.cpp:377-422): its DP aligns
reads across short N runs, each N column scored at the N penalty and
counted in XN, capped by nCeil (aligner_swsse_ee_u8.cpp:1284). Verified
against bowtie2-align-s on a 600bp genome with a 1-N and a 3-N run:
spanning 80bp reads align at AS=-1/-3 with XN 1/3. Our joined text
removes N runs, so such problems are re-framed in per-reference
coordinates with explicit N-filled windows (models/aligner.py
_run_bridge)."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.utils import dna


def mk(seq, name="r", rdid=0):
    codes = dna.encode(seq)
    return Read(rdid, name, codes, np.full(len(codes), 40, np.uint8))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(77)
    ref = rng.integers(0, 4, 600).astype(np.int8)
    s = list(dna.decode(ref))
    s[300] = "N"
    s[450:453] = "NNN"
    s[520:540] = "N" * 20  # run longer than nceil(80)=12
    s = "".join(s)
    fa = tmp_path_factory.mktemp("refn") / "refn.fa"
    fa.write_text(">t0\n" + s + "\n")
    fm = build_index(str(fa))
    return s, fm, TPUAligner(fm)


def test_span_single_n(setup):
    s, fm, al = setup
    rd = mk(s[260:340].replace("N", "A"), "span1")
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert (res.refoff, res.score) == (260, -1)
    assert res.stats["xn"] == 1 and res.stats["xm"] == 1
    assert res.cigar == [("M", 80)]
    assert res.mapq == 42


def test_span_three_n_run(setup):
    s, fm, al = setup
    rd = mk(s[420:500].replace("N", "C"), "span3")
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert (res.refoff, res.score) == (420, -3)
    assert res.stats["xn"] == 3
    # MD marks each ref-N column (decoded as N) as a mismatch event
    assert res.stats["md"].count("N") == 3


def test_gap_beyond_nceil_rejected(setup):
    # spanning the 20-N run needs ns=20 > nceil(80)=12: the reference's
    # backtrace rejects it (score.ns_ > nceil_)
    s, fm, al = setup
    rd = mk(s[480:560].replace("N", "G"), "span20")
    res = al.align_batch([rd])[0]
    assert res.status == "unaligned"


def test_rc_read_across_n(setup):
    s, fm, al = setup
    seq = dna.encode(s[260:340].replace("N", "A"))
    rd = Read(0, "rc", dna.revcomp(seq), np.full(80, 40, np.uint8))
    res = al.align_batch([rd])[0]
    assert res.status == "aligned" and not res.fw
    assert (res.refoff, res.score) == (260, -1)


def test_clean_reads_unaffected(setup):
    s, fm, al = setup
    rd = mk(s[310:390], "within")
    res = al.align_batch([rd])[0]
    assert (res.status, res.refoff, res.score) == ("aligned", 310, 0)
    assert res.cigar == [("M", 80)]


def test_ref_window_decode(setup):
    s, fm, al = setup
    w = fm.refmap.ref_window(al.text, 0, 295, 10)
    assert dna.decode(w) == s[295:305]
    assert w[300 - 295] == 4


# ---- NCEIL policy cases (simple_tests.pl "N filtering 1-6", :3875-3930) --

def _nceil_aligner(ref_str, nceil, seed_len=20, tmp=None):
    from omp_bowtie2_prime_tpu.index.fasta import join_references
    from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
    from omp_bowtie2_prime_tpu.models.aligner import AlignOpts
    from omp_bowtie2_prime_tpu.utils.scoring import (
        Scoring, SimpleFunc,
    )

    joined, refmap = join_references(["t0"], [dna.encode(ref_str)])
    fm = build_index_from_text(joined, refmap, ftab_k=min(4, seed_len))
    sc = Scoring(n_ceil=SimpleFunc.parse(nceil))
    kw = {} if seed_len == 20 else dict(
        ival=SimpleFunc.parse("C,1,0")
    )
    return TPUAligner(fm, scoring=sc,
                      opts=AlignOpts(seed_len=seed_len, **kw))


CLEAN_REF = "GAGACTTTATACGCATCGAACTATCGCTCTA"
READ13 = "ATACGCATCGAAC"  # = CLEAN_REF[8:21]


def test_nceil_zero_clean_ref_aligns():
    al = _nceil_aligner(CLEAN_REF, "L,0,0", seed_len=13)
    res = al.align_batch([mk(READ13)])[0]
    assert (res.status, res.refoff) == ("aligned", 8)


@pytest.mark.parametrize("npos", [10, 20, 8])
def test_nceil_zero_ref_n_rejected(npos):
    # any ref N inside the alignment makes ns=1 > nceil=0
    ref = CLEAN_REF[:npos] + "N" + CLEAN_REF[npos + 1:]
    al = _nceil_aligner(ref, "L,0,0", seed_len=4)
    res = al.align_batch([mk(READ13)])[0]
    assert res.status == "unaligned"


def test_nceil_one_ref_n_allowed():
    # NCEIL=L,0,0.1 -> nceil(13)=1: one ref N passes, scored at npen
    ref = CLEAN_REF[:10] + "N" + CLEAN_REF[11:]
    al = _nceil_aligner(ref, "L,0,0.1", seed_len=4)
    res = al.align_batch([mk(READ13)])[0]
    assert (res.status, res.refoff, res.score) == ("aligned", 8, -1)
    assert res.stats["xn"] == 1


def test_nceil_one_two_ref_ns_rejected():
    ref = CLEAN_REF[:8] + "N" + CLEAN_REF[9:20] + "N" + CLEAN_REF[21:]
    al = _nceil_aligner(ref, "L,0,0.1", seed_len=4)
    res = al.align_batch([mk(READ13)])[0]
    assert res.status == "unaligned"
