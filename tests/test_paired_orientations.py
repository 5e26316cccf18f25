"""Paired-end orientation matrix end to end: --rf and --ff pair layouts
through the full PairedAligner, plus -I/-X insert gating and the
--no-mixed/--no-discordant reporting switches (simple_tests.pl's paired
tranche exercises these against upstream bowtie2; the fork itself ships
unpaired-only, bt2_search.cpp:4050-4063, so expectations here follow the
surviving policy code pe.h:43-95/pe.cpp:37-159)."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.models.paired import PairedAligner
from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.pe import (
    PEPolicy, PE_POLICY_FR, PE_POLICY_RF, PE_POLICY_FF,
)


@pytest.fixture(scope="module")
def ogenome():
    rng = np.random.default_rng(31)
    text = rng.integers(0, 4, 30000).astype(np.int8)
    joined, refmap = join_references(["chrO"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    al = TPUAligner(fm)
    return text, al


def _reads(i, s1, s2, ln=100):
    q = np.full(ln, 35, np.uint8)
    return (Read(i, f"o{i}", s1.astype(np.int8), q.copy()),
            Read(i, f"o{i}", s2.astype(np.int8), q.copy()))


def make_fr(text, rng, i, frag=300, ln=100):
    pos = int(rng.integers(0, len(text) - frag))
    s1 = text[pos: pos + ln].copy()
    s2 = dna.revcomp(text[pos + frag - ln: pos + frag])
    return (*_reads(i, s1, s2, ln), pos)


def make_rf(text, rng, i, frag=300, ln=100):
    # mate1 reverse-comp at the LEFT extreme, mate2 forward at the right:
    # upstream --rf layout (fragment still pos..pos+frag)
    pos = int(rng.integers(0, len(text) - frag))
    s1 = dna.revcomp(text[pos: pos + ln])
    s2 = text[pos + frag - ln: pos + frag].copy()
    return (*_reads(i, s1, s2, ln), pos)


def make_ff(text, rng, i, frag=300, ln=100):
    # both mates forward, mate1 upstream of mate2 (--ff layout)
    pos = int(rng.integers(0, len(text) - frag))
    s1 = text[pos: pos + ln].copy()
    s2 = text[pos + frag - ln: pos + frag].copy()
    return (*_reads(i, s1, s2, ln), pos)


@pytest.mark.parametrize(
    "maker,pol,m1fw,m2fw",
    [
        (make_rf, PE_POLICY_RF, False, True),
        (make_ff, PE_POLICY_FF, True, True),
    ],
)
def test_orientation_concordant(ogenome, maker, pol, m1fw, m2fw):
    text, al = ogenome
    pal = PairedAligner(al, PEPolicy(pol=pol))
    rng = np.random.default_rng(41)
    pairs, truth = [], []
    for i in range(12):
        r1, r2, pos = maker(text, rng, i)
        pairs.append((r1, r2))
        truth.append(pos)
    res = pal.align_pairs(pairs)
    ncp = 0
    for pres, pos in zip(res, truth):
        if pres.cat == "concord":
            ncp += 1
            assert pres.m1.fw == m1fw and pres.m2.fw == m2fw
            left = pres.m1 if pres.m1.refoff <= pres.m2.refoff else pres.m2
            assert left.refoff == pos
            assert abs(pres.tlen1) == 300
    assert ncp >= 11


def test_fr_pairs_discord_under_rf_policy(ogenome):
    """An FR-layout pair must NOT classify concordant under --rf."""
    text, al = ogenome
    pal = PairedAligner(al, PEPolicy(pol=PE_POLICY_RF))
    rng = np.random.default_rng(42)
    pairs = []
    for i in range(8):
        r1, r2, _ = make_fr(text, rng, i)
        pairs.append((r1, r2))
    res = pal.align_pairs(pairs)
    assert all(p.cat != "concord" for p in res)


def test_insert_size_gates(ogenome):
    """-I/-X bounds: a 300bp fragment is concordant only when
    minfrag <= 300 <= maxfrag (pe.cpp:62-70)."""
    text, al = ogenome
    rng = np.random.default_rng(43)
    pairs = []
    for i in range(8):
        r1, r2, _ = make_fr(text, rng, i)
        pairs.append((r1, r2))

    ok = PairedAligner(al, PEPolicy(pol=PE_POLICY_FR, minfrag=0,
                                    maxfrag=500)).align_pairs(pairs)
    assert sum(p.cat == "concord" for p in ok) >= 7

    too_short = PairedAligner(al, PEPolicy(pol=PE_POLICY_FR, minfrag=0,
                                           maxfrag=250)).align_pairs(pairs)
    assert all(p.cat != "concord" for p in too_short)

    too_long = PairedAligner(al, PEPolicy(pol=PE_POLICY_FR, minfrag=350,
                                          maxfrag=800)).align_pairs(pairs)
    assert all(p.cat != "concord" for p in too_long)


def test_no_mixed_and_no_discordant(ogenome):
    """--no-mixed suppresses unpaired fallback; --no-discordant suppresses
    discordant promotion (ReportingParams aln_sink.h:235; here: one mate
    random = never concordant)."""
    text, al = ogenome
    rng = np.random.default_rng(44)
    pairs = []
    for i in range(6):
        r1, r2, _ = make_fr(text, rng, i)
        # make mate2 unalignable random junk
        r2.seq = rng.integers(0, 4, 100).astype(np.int8)
        pairs.append((r1, r2))

    mixed = PairedAligner(al, PEPolicy(pol=PE_POLICY_FR),
                          mixed=True).align_pairs(pairs)
    assert sum(p.m1.status == "aligned" for p in mixed) >= 5
    assert all(p.cat != "concord" for p in mixed)

    nomix = PairedAligner(al, PEPolicy(pol=PE_POLICY_FR),
                          mixed=False).align_pairs(pairs)
    for p in nomix:
        # no-mixed: a lone aligned mate must not surface as an unpaired
        # alignment (mate2 is junk, so concord/discord are impossible)
        assert p.cat == "mixed"
        assert p.m1.status != "aligned" and p.m2.status != "aligned"
