"""Paired-end tests: policy math vs the reference's table-driven MAIN_PE
expectations (pe.cpp:356-466 style), concordant/discordant/mixed outcomes
on simulated pairs, mate rescue, and paired SAM self-consistency."""

import io

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.io.sam import SamWriter
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.models.paired import PairedAligner
from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.pe import (
    PEPolicy, PE_POLICY_FR, PE_POLICY_FF, PE_ALS_NORMAL, PE_ALS_OVERLAP,
    PE_ALS_CONTAIN, PE_ALS_DOVETAIL, PE_ALS_DISCORD, fragment_length,
)
from omp_bowtie2_prime_tpu.utils.samcheck import check_sam


# ---------------- policy unit tests ----------------


def test_classify_fr_normal():
    pe = PEPolicy(pol=PE_POLICY_FR, minfrag=0, maxfrag=500)
    # mate1 fw at 100, mate2 rc at 300: classic FR concordant
    assert pe.classify(100, 100, True, 300, 100, False) == PE_ALS_NORMAL
    # same orientation -> discordant
    assert pe.classify(100, 100, True, 300, 100, True) == PE_ALS_DISCORD
    # too far apart -> discordant
    assert pe.classify(100, 100, True, 900, 100, False) == PE_ALS_DISCORD
    # wrong order (rc mate left of fw mate, no overlap) -> discordant
    assert pe.classify(300, 100, True, 100, 100, False) == PE_ALS_DISCORD


def test_classify_overlap_contain_dovetail():
    pe = PEPolicy(pol=PE_POLICY_FR)
    assert pe.classify(100, 100, True, 150, 100, False) == PE_ALS_OVERLAP
    # mate1 (left, fw) contained in mate2's span without extending past it
    assert pe.classify(100, 50, True, 100, 100, False) == PE_ALS_CONTAIN
    # left mate extending past right mate's end = dovetail even under
    # containment (pe.cpp:127-133), rejected by default
    assert pe.classify(100, 100, True, 110, 50, False) == PE_ALS_DISCORD
    # dovetail (mate2 starts left of mate1) rejected by default
    assert pe.classify(100, 100, True, 95, 100, False) == PE_ALS_DISCORD
    pe2 = PEPolicy(pol=PE_POLICY_FR, dovetail_ok=True)
    assert pe2.classify(100, 100, True, 95, 100, False) == PE_ALS_DOVETAIL
    pe3 = PEPolicy(pol=PE_POLICY_FR, olap_ok=False)
    assert pe3.classify(100, 100, True, 150, 100, False) == PE_ALS_DISCORD


def test_classify_min_insert():
    pe = PEPolicy(pol=PE_POLICY_FR, minfrag=250, maxfrag=500)
    assert pe.classify(100, 100, True, 300, 100, False) == PE_ALS_NORMAL
    assert pe.classify(100, 100, True, 120, 100, False) == PE_ALS_DISCORD


def test_mate_dir_fr():
    pe = PEPolicy(pol=PE_POLICY_FR)
    # anchor mate1 fw -> other right, rc
    assert pe.mate_dir(True, True) == (False, False)
    # anchor mate1 rc -> other left, fw
    assert pe.mate_dir(True, False) == (True, True)
    # FF policy: anchor mate1 fw -> other right, fw
    peff = PEPolicy(pol=PE_POLICY_FF)
    assert peff.mate_dir(True, True) == (False, True)
    assert peff.mate_dir(False, True) == (True, True)


def test_other_mate_window_fr_right():
    pe = PEPolicy(pol=PE_POLICY_FR, minfrag=0, maxfrag=500)
    win = pe.other_mate_window(True, True, 1000, 100, 100, 100)
    assert win is not None
    oleft, oll, olr, orl, orr, ofw = win
    assert not oleft and not ofw
    # RHS within [off+minfrag-1, off+maxfrag-1]
    assert orl == 1000 and orr == 1000 + 499
    # no dovetail: LHS >= off
    assert oll == 1000


def test_fragment_length_sign():
    # mate1 fw upstream at 100..199, mate2 rc at 300..399 -> +300 / -300
    assert fragment_length(100, 100, True, True, 300, 100, False) == 300
    assert fragment_length(300, 100, False, False, 100, 100, True) == -300


# ---------------- end-to-end paired pipeline ----------------


@pytest.fixture(scope="module")
def pgenome():
    rng = np.random.default_rng(11)
    text = rng.integers(0, 4, 30000).astype(np.int8)
    joined, refmap = join_references(["chrP"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    al = TPUAligner(fm)
    pal = PairedAligner(al)
    return text, fm, al, pal


def make_pair(text, rng, i, frag=300, ln=100, mut1=0, mut2=0):
    pos = int(rng.integers(0, len(text) - frag))
    s1 = text[pos : pos + ln].copy()
    s2 = dna.revcomp(text[pos + frag - ln : pos + frag])
    for s, nm in ((s1, mut1), (s2, mut2)):
        for _ in range(nm):
            p = int(rng.integers(5, ln - 5))
            s[p] = (s[p] + 1 + rng.integers(0, 3)) % 4
    q = np.full(ln, 35, np.uint8)
    return (
        Read(i, f"p{i}", s1.astype(np.int8), q.copy()),
        Read(i, f"p{i}", s2.astype(np.int8), q.copy()),
        pos,
    )


def test_concordant_pairs(pgenome):
    text, fm, al, pal = pgenome
    rng = np.random.default_rng(21)
    pairs, truth = [], []
    for i in range(20):
        r1, r2, pos = make_pair(text, rng, i, mut1=1, mut2=1)
        pairs.append((r1, r2))
        truth.append(pos)
    res = pal.align_pairs(pairs)
    ncp = 0
    for pres, pos in zip(res, truth):
        if pres.cat == "concord":
            ncp += 1
            assert pres.m1.refoff == pos
            assert pres.m1.fw and not pres.m2.fw
            assert pres.tlen1 == 300 and pres.tlen2 == -300
            assert pres.m1.mapq == pres.m2.mapq
    assert ncp >= 18


def test_mate_rescue(pgenome):
    """Mate 2 heavily mutated so seeding fails on it; anchor window DP must
    rescue it into a concordant pair."""
    text, fm, al, pal = pgenome
    rng = np.random.default_rng(22)
    found = 0
    pairs = []
    for i in range(6):
        r1, r2, pos = make_pair(text, rng, i, mut1=0, mut2=0)
        # mutate mate2 every 12 bp: kills all 22bp exact seeds but keeps
        # alignment score above minsc (8 muts * -6 >= -66? no; use qual 10)
        s2 = r2.seq.copy()
        for p in range(6, 100, 13):
            s2[p] = (s2[p] + 1) % 4
        r2.seq = s2
        r2.qual = np.full(100, 2, np.uint8)  # low qual -> mm penalty 2
        pairs.append((r1, r2))
    res = pal.align_pairs(pairs)
    for pres in res:
        if pres.cat == "concord":
            found += 1
    assert found >= 5


def test_discordant_promotion(pgenome):
    text, fm, al, pal = pgenome
    rng = np.random.default_rng(23)
    # both mates unique but 2000 apart (> maxins 500)
    pos1, pos2 = 1000, 4000
    s1 = text[pos1 : pos1 + 100].copy()
    s2 = dna.revcomp(text[pos2 : pos2 + 100])
    q = np.full(100, 35, np.uint8)
    pairs = [(Read(0, "d0", s1.astype(np.int8), q.copy()),
              Read(0, "d0", s2.astype(np.int8), q.copy()))]
    res = pal.align_pairs(pairs)
    assert res[0].cat == "discord"
    assert res[0].m1.refoff == pos1
    assert res[0].m2.refoff == pos2
    # same-ref discordant pair still gets TLEN (aligner_result.h:1320-1330)
    assert res[0].tlen1 == pos2 + 100 - pos1


def test_mixed_fallback(pgenome):
    text, fm, al, pal = pgenome
    rng = np.random.default_rng(24)
    s1 = text[2000:2100].copy()
    s2 = rng.integers(0, 4, 100).astype(np.int8)  # random: won't align
    q = np.full(100, 35, np.uint8)
    pairs = [(Read(0, "m0", s1.astype(np.int8), q.copy()),
              Read(0, "m0", s2, q.copy()))]
    res = pal.align_pairs(pairs)
    assert res[0].cat == "mixed"
    assert res[0].m1.status == "aligned"
    assert res[0].m1.refoff == 2000
    assert res[0].m2.status == "unaligned"


def test_paired_sam_self_consistent(pgenome, tmp_path):
    text, fm, al, pal = pgenome
    rng = np.random.default_rng(25)
    pairs = []
    for i in range(12):
        r1, r2, _ = make_pair(text, rng, i, mut1=1, mut2=2)
        pairs.append((r1, r2))
    res = pal.align_pairs(pairs)
    buf = io.StringIO()
    w = SamWriter(buf, fm.refmap.refnames, fm.refmap.reflens)
    w.write_header()
    for (r1, r2), pres in zip(pairs, res):
        w.write_pair(r1, r2, pres.m1, pres.m2, pres.cat, pres.tlen1, pres.tlen2)
    p = tmp_path / "out.sam"
    p.write_text(buf.getvalue())
    n, clean, kinds = check_sam(str(p), {"chrP": text})
    assert n > 0
    assert clean == n, kinds
    # flags sanity on the emitted records
    for line in buf.getvalue().splitlines():
        if line.startswith("@"):
            continue
        fl = int(line.split("\t")[1])
        assert fl & 0x1  # paired bit always set
        assert (fl & 0x40) or (fl & 0x80)
    summ = w.summary.render()
    assert "were paired" in summ


def test_paired_strand_ban_nofw_norc(pgenome):
    """--nofw/--norc are fragment-strand bans in paired mode: the reference
    remaps them per mate through the orientation policy (nofw[mate] =
    mateNfw ? gNofw : gNorc, bt2_search.cpp:3085-3088). For FR pairs
    planted on the forward strand, --nofw kills both mates (mate1's fw and
    mate2's rc alignments are the banned fragment) while --norc leaves the
    pair fully concordant."""
    import dataclasses as dc

    text, fm, _al, _pal = pgenome
    rng = np.random.default_rng(33)
    pairs = [make_pair(text, rng, i)[:2] for i in range(6)]

    al = TPUAligner(fm)
    al.opts = dc.replace(al.opts, nofw=True)
    res = PairedAligner(al).align_pairs(pairs)
    assert all(p.cat == "mixed" and p.m1.status == "unaligned"
               and p.m2.status == "unaligned" for p in res)

    al2 = TPUAligner(fm)
    al2.opts = dc.replace(al2.opts, norc=True)
    res2 = PairedAligner(al2).align_pairs(pairs)
    assert sum(p.cat == "concord" for p in res2) >= 5
