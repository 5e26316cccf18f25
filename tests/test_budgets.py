"""Search-budget semantics: the -D DP fail streak (maxDpStreak,
bt2_search.cpp:415-418, aligner_sw_driver.cpp:512-514) and the
--seed-boost re-seeding gate (seedBoostThresh, bt2_search.cpp:432, 2792;
averageHitsPerSeed aligner_seed.h:802-807)."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts
from omp_bowtie2_prime_tpu.utils import dna

SL = 22  # default seed length; 100bp read -> ival 12, round-2 shift 6


def _mk_fm(text):
    joined, refmap = join_references(["chrB"], [text.copy()])
    return build_index_from_text(joined, refmap, ftab_k=8)


def _read(seq, name="r"):
    return Read(0, name, np.asarray(seq, np.int8),
                np.full(len(seq), 40, np.uint8))


def _mutate(base):
    return (base + 1) % 4


@pytest.fixture(scope="module")
def decoy_case():
    """100bp read; mismatch at 12 kills seeds@0/@12 at the true locus;
    read[0:22] (with the mismatch) is copied verbatim to a decoy locus.
    Round 1 then yields two DP problems: the decoy diagonal (ranked
    first: lower seed offset) which fails minsc, and the true diagonal
    which passes."""
    rng = np.random.default_rng(55)
    text = rng.integers(0, 4, 3000).astype(np.int8)
    true_pos = 1000
    read = text[true_pos : true_pos + 100].copy()
    read[12] = _mutate(read[12])
    text[2000 : 2000 + SL] = read[:SL]  # decoy: exact copy of seed@0
    return text, read, true_pos


def test_streak_stops_after_failed_decoy(decoy_case):
    text, read, true_pos = decoy_case
    fm = _mk_fm(text)
    # -D 1: the decoy DP fails first, exhausting the streak before the
    # true diagonal's problem is considered
    al = TPUAligner(fm, opts=AlignOpts(dps=1, nrounds=1))
    assert al.align_batch([_read(read)])[0].status == "unaligned"
    # default -D 15: decoy fails (streak 1 < 15), true locus reported
    al = TPUAligner(fm, opts=AlignOpts(nrounds=1))
    res = al.align_batch([_read(read)])[0]
    assert res.status == "aligned" and res.refoff == true_pos


@pytest.fixture(scope="module")
def reseed_case():
    """Mismatches at {12,45,60,84} kill every round-1 seed (offsets
    0,12,...,84) at the true locus while round-2 seed@18 ([18,40)) is
    clean; a decoy copy of read[0:22] provides exactly one round-1 seed
    hit so averageHitsPerSeed == 1."""
    rng = np.random.default_rng(56)
    text = rng.integers(0, 4, 3000).astype(np.int8)
    true_pos = 1000
    read = text[true_pos : true_pos + 100].copy()
    for m in (12, 45, 60, 84):
        read[m] = _mutate(read[m])
    decoyed = text.copy()
    decoyed[2000 : 2000 + SL] = read[:SL]
    return text, decoyed, read, true_pos


def test_seed_boost_gates_reseeding(reseed_case):
    text, decoyed, read, true_pos = reseed_case
    # with the decoy hit, round 1 has nonz=1/avg=1 < 300: the reference
    # gives up after round 1 (bt2_search.cpp:2792) -> unaligned
    al = TPUAligner(_mk_fm(decoyed))
    assert al.align_batch([_read(read)])[0].status == "unaligned"
    # gate disabled: round 2 seeds at offset 6 find the true locus
    al = TPUAligner(_mk_fm(decoyed), opts=AlignOpts(seed_boost=0))
    res = al.align_batch([_read(read)])[0]
    assert res.status == "aligned" and res.refoff == true_pos


def test_zero_hit_reads_always_reseed(reseed_case):
    """A read with NO round-1 hits has averageHitsPerSeed = MAX: it
    re-seeds even under the default gate (aligner_seed.h:803-805)."""
    text, decoyed, read, true_pos = reseed_case
    al = TPUAligner(_mk_fm(text))  # no decoy -> zero round-1 hits
    res = al.align_batch([_read(read)])[0]
    assert res.status == "aligned" and res.refoff == true_pos
