import numpy as np
import pytest

from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.suffix_array import suffix_array
from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references

from fm_naive import fm_backward_search, naive_search


def rand_text(n, seed):
    return np.random.default_rng(seed).integers(0, 4, n).astype(np.int8)


def test_pack_unpack_roundtrip():
    t = rand_text(1000, 0)
    assert np.array_equal(dna.unpack_2bit(dna.pack_2bit(t), 1000), t)


def test_encode_revcomp():
    codes = dna.encode("ACGTN")
    assert list(codes) == [0, 1, 2, 3, 4]
    assert dna.decode(dna.revcomp(codes)) == "NACGT"


def test_suffix_array_small():
    t = dna.encode("GATTACA")
    sa = suffix_array(t)
    n = len(t)
    # brute force: sort suffixes of t + '$'
    s = "GATTACA\x00"
    expect = sorted(range(n + 1), key=lambda i: s[i:])
    assert list(sa) == expect


@pytest.mark.parametrize("n,seed", [(100, 1), (1000, 2), (5000, 3)])
def test_suffix_array_random(n, seed):
    t = rand_text(n, seed)
    sa = suffix_array(t)
    # spot-check ordering on a sample of adjacent pairs
    s = bytes(list(t + 1)) + b"\x00"
    idx = np.random.default_rng(seed).integers(0, n, 50)
    for i in idx:
        assert s[sa[i]:] < s[sa[i + 1]:]


@pytest.mark.parametrize("n,seed", [(300, 10), (2000, 11)])
def test_fm_backward_search_matches_bruteforce(n, seed):
    t = rand_text(n, seed)
    fm = build_index_from_text(t, None, ftab_k=4)
    rng = np.random.default_rng(seed + 1)
    for m in [1, 2, 3, 5, 8, 22]:
        for _ in range(20):
            if rng.random() < 0.7 and n > m:
                pos = rng.integers(0, n - m)
                pat = t[pos : pos + m]
            else:
                pat = rng.integers(0, 4, m).astype(np.int8)
            top, bot = fm_backward_search(fm, pat)
            assert bot - top == naive_search(t, pat), (m, pat)


def test_ftab_matches_search():
    t = rand_text(4000, 42)
    k = 5
    fm = build_index_from_text(t, None, ftab_k=k)
    rng = np.random.default_rng(7)
    for _ in range(50):
        pat = rng.integers(0, 4, k).astype(np.int8)
        q = 0
        for c in pat:
            q = q * 4 + int(c)
        top, bot = fm_backward_search(fm, pat)
        assert fm.ftab_top[q] == top
        assert fm.ftab_bot[q] == bot


def test_sa_sample_marks():
    t = rand_text(1000, 5)
    fm = build_index_from_text(t, None, ftab_k=4, srate=16)
    sa = suffix_array(t)
    marked = (sa % 16) == 0
    assert np.array_equal(fm.sa_sample, sa[marked].astype(np.uint32))
    # mark bitmap decodes back to `marked`
    bits = (
        (fm.mark_words[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    ).reshape(-1)[: fm.nrows]
    assert np.array_equal(bits.astype(bool), marked)


def test_join_references_splits_on_N():
    names = ["a", "b"]
    seqs = [dna.encode("ACGTNNNGGT"), dna.encode("NNTTT")]
    joined, rm = join_references(names, seqs)
    assert dna.decode(joined) == "ACGTGGTTTT"
    assert rm.joined_to_ref(0, 4) == (0, 0)
    assert rm.joined_to_ref(4, 3) == (0, 7)
    assert rm.joined_to_ref(7, 3) == (1, 2)
    assert rm.joined_to_ref(3, 3) is None  # straddles fragment boundary
    refid, refoff, valid = rm.joined_to_ref_batch(
        np.array([0, 4, 7, 3]), np.array([4, 3, 3, 3])
    )
    assert list(valid) == [True, True, True, False]
    assert list(refid[:3]) == [0, 0, 1]
    assert list(refoff[:3]) == [0, 7, 2]


def test_subsample_sa_offrate_override():
    """-o at align time (FMIndex.subsample_sa, bt2_io.cpp:220-235):
    sparser marks, same resolved offsets through the walk kernel."""
    from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
    from omp_bowtie2_prime_tpu.index.format import DeviceIndex
    from omp_bowtie2_prime_tpu.ops import walk

    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    text = rng.integers(0, 4, 3000).astype(np.int8)
    joined, rm = join_references(["c"], [text])
    fm = build_index_from_text(joined, rm, ftab_k=7)
    fm64 = fm.subsample_sa(64)
    assert fm64.srate == 64
    # sample set: exactly the positions = 0 mod 64
    assert np.array_equal(
        fm64.sa_sample, fm.sa_sample[fm.sa_sample % 64 == 0]
    )
    assert fm64.mark_cp[-1] <= fm.mark_cp[-1]
    # walks resolve every row to the same offset as the dense sample
    idx16 = DeviceIndex.from_host(fm)
    idx64 = DeviceIndex.from_host(fm64)
    rows = jnp.asarray(rng.integers(0, fm.nrows, 512, dtype=np.int64))
    valid = jnp.ones(512, bool)
    o16 = np.asarray(walk.resolve_rows(idx16, rows, valid))
    o64 = np.asarray(walk.resolve_rows(idx64, rows, valid))
    assert np.array_equal(o16, o64)
