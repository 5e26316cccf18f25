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
