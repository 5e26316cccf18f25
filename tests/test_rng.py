"""Reference-RNG parity: golden values produced by compiling the
reference's own random_source.h / EList::shufflePortion (ds.h:876-887)
into a standalone oracle (g++ -I/root/reference) and recording its
output.  gen_rand_seed is checked structurally (pat.cpp:45-82)."""

import numpy as np

from omp_bowtie2_prime_tpu.utils.rng import (
    RandomSource, gen_rand_seed, select_by_score, shuffle_portion,
)

# oracle: RandomSource r; r.init(seed); six nextU32, three nextSizeT
GOLDEN_U32 = {
    0: [1196430684, 2868478712, 2670634196, 2748909654, 2498768615,
        3167867562],
    1: [1586018643, 3027483603, 1587072463, 2388826527, 2745541851,
        1814082320],
    77: [1128549397, 2225304340, 839877535, 789504269, 22922567,
         2010458196],
    0xDEADBEEF: [4125717074, 950216730, 3627697230, 4230335373,
                 1311130450, 1183569199],
    4098765432: [2068979793, 2911259821, 3291627036, 3559246207,
                 272191868, 2326883984],
}
GOLDEN_SZT = {
    0: [5138630662579389176, 11470286534148163670, 10732129484864082602],
    1: [6811898205558782931, 6816424327355996575, 11792012461658387216],
    77: [4847082754260824852, 3607246546259599629, 98451677615827028],
    0xDEADBEEF: [17719819906329028634, 15580840966870125453,
                 5631262404723332399],
    4098765432: [8886200549931109549, 14137430473808660863,
                 1169055173624032912],
}


def test_lcg_u32_matches_reference():
    for seed, want in GOLDEN_U32.items():
        r = RandomSource(seed)
        assert [r.next_u32() for _ in want] == want


def test_lcg_sizet_matches_reference():
    for seed, want in GOLDEN_SZT.items():
        r = RandomSource(seed)
        assert [r.next_size_t() for _ in want] == want


def test_shuffle_portion_matches_reference():
    # oracle: 0..9, seed 42, shufflePortion(2, 5) -> 0 1 6 2 3 5 4 7 8 9
    l = list(range(10))
    shuffle_portion(l, 2, 5, RandomSource(42))
    assert l == [0, 1, 6, 2, 3, 5, 4, 7, 8, 9]
    # oracle: 0..7, seed 12345, shufflePortion(0, 8) -> 1 6 4 7 0 5 2 3
    m = list(range(8))
    shuffle_portion(m, 0, 8, RandomSource(12345))
    assert m == [1, 6, 4, 7, 0, 5, 2, 3]


def test_gen_rand_seed_properties():
    seq = np.array([0, 1, 2, 3, 0, 1], np.int8)
    qual = np.full(6, 40, np.uint8)
    s0 = gen_rand_seed(seq, qual, "readA", 0)
    # deterministic
    assert s0 == gen_rand_seed(seq, qual, "readA", 0)
    # sensitive to sequence, qual, name and global seed
    seq2 = seq.copy(); seq2[0] = 3
    assert s0 != gen_rand_seed(seq2, qual, "readA", 0)
    assert s0 != gen_rand_seed(seq, qual - 1, "readA", 0)
    assert s0 != gen_rand_seed(seq, qual, "readB", 0)
    assert s0 != gen_rand_seed(seq, qual, "readA", 7)
    # name hashed only up to '/': mates share the seed basis (pat.cpp:76)
    assert gen_rand_seed(seq, qual, "readA/1", 0) == \
        gen_rand_seed(seq, qual, "readA/2", 0)
    assert 0 <= s0 <= 0xFFFFFFFF


def test_gen_rand_seed_base_value():
    # empty read, empty name: just the global-seed mixer
    # (seed+101)*59*61*67*71*73*79*83 mod 2^32
    for g in (0, 1, 33):
        want = ((g + 101) * 59 * 61 * 67 * 71 * 73 * 79 * 83) & 0xFFFFFFFF
        got = gen_rand_seed(np.zeros(0, np.int8), np.zeros(0, np.uint8),
                            "", g)
        assert got == want


def test_select_by_score_orders_and_shuffles():
    # descending by score; the tied streak is permuted by the LCG,
    # deterministically for a given seed
    entries = ["a", "b", "c", "d", "e"]
    scores = [-5, 0, 0, 0, -9]
    out1 = select_by_score(entries, scores, RandomSource(7))
    out2 = select_by_score(entries, scores, RandomSource(7))
    assert out1 == out2
    assert set(out1[:3]) == {"b", "c", "d"}  # the tied best streak
    assert out1[3:] == ["a", "e"]
    # different seeds explore different permutations
    perms = {tuple(select_by_score(entries, scores, RandomSource(s)))
             for s in range(30)}
    assert len(perms) > 1


# ---------------- end-to-end tie-break behavior ----------------

import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import AlignOpts, TPUAligner


@pytest.fixture(scope="module")
def repeat_genome():
    """Genome with an identical 400bp unit repeated at 8 known loci."""
    rs = np.random.default_rng(5)
    text = rs.integers(0, 4, 40000).astype(np.int8)
    unit = rs.integers(0, 4, 400).astype(np.int8)
    loci = [2000 + 4500 * k for k in range(8)]
    for p in loci:
        text[p : p + 400] = unit
    joined, refmap = join_references(["chrR"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    return fm, unit, loci


def _reads_from_unit(unit, n):
    return [
        Read(i, f"mm{i}", unit[7 : 7 + 100].copy(),
             np.full(100, 35 + (i % 5), np.uint8))
        for i in range(n)
    ]


def test_multimap_tiebreak_is_seeded_and_spread(repeat_genome):
    fm, unit, loci = repeat_genome
    al = TPUAligner(fm)
    reads = _reads_from_unit(unit, 24)
    res = al.align_batch(reads)
    picks = []
    for r in res:
        assert r.status == "aligned" and r.mapq <= 1  # multi-mapping
        assert (r.refoff - 7) in [p for p in loci]
        picks.append(r.refoff)
    # the read-seeded shuffle should spread picks over several loci
    # (a deterministic tiebreak would fix a single locus for all reads
    # with identical sequence BUT differing quals/names reseed the LCG)
    assert len(set(picks)) > 2
    # bit-reproducible across runs and across batch splits
    again = al.align_batch(reads)
    assert [r.refoff for r in again] == picks
    split = [al.align_batch([rd])[0].refoff for rd in reads]
    assert split == picks


def test_global_seed_changes_picks(repeat_genome):
    fm, unit, loci = repeat_genome
    reads = _reads_from_unit(unit, 24)
    p0 = [r.refoff for r in TPUAligner(fm).align_batch(reads)]
    al7 = TPUAligner(fm, opts=AlignOpts(rng_seed=7))
    p7 = [r.refoff for r in al7.align_batch(reads)]
    assert p0 != p7  # --seed reshuffles ties


def test_select_by_score_ordering_matches_reference_oracle():
    """Golden orderings from an oracle compiling the reference's own
    EList sort/reverse/shufflePortion exactly as selectByScore applies
    them (aln_sink.cpp:1540-1573)."""
    s1 = [-5, 0, 0, 0, -9, 0, -5, -5]
    s2 = [3, 3, 3, 3, 3, 3]
    s3 = [1, 2, 3, 4]
    golden = [
        (s1, 42, [2, 1, 3, 5, 0, 7, 6, 4]),
        (s1, 12345, [3, 5, 2, 1, 0, 6, 7, 4]),
        (s2, 7, [0, 5, 1, 4, 3, 2]),
        (s2, 0xDEADBEEF, [3, 1, 0, 5, 4, 2]),
        (s3, 1, [3, 2, 1, 0]),
        (s1, 0, [5, 1, 2, 3, 6, 0, 7, 4]),
    ]
    for scores, seed, want in golden:
        out = select_by_score(list(range(len(scores))), scores,
                              RandomSource(seed))
        assert out == want, (scores, seed, out, want)
