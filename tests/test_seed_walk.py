import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.format import DeviceIndex
from omp_bowtie2_prime_tpu.ops.seed_search import search_seeds
from omp_bowtie2_prime_tpu.ops.walk import resolve_rows
from omp_bowtie2_prime_tpu.utils.suffix_array import suffix_array

from fm_naive import naive_search

SEED_LEN = 22


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(99)
    t = rng.integers(0, 4, 5000).astype(np.int8)
    fm = build_index_from_text(t, None, ftab_k=6)
    idx = DeviceIndex.from_host(fm)
    sa = suffix_array(t)
    search = jax.jit(search_seeds)
    resolve = jax.jit(resolve_rows)
    return t, fm, idx, sa, search, resolve


def make_seeds(t, rng, b, with_n=0):
    n = len(t)
    seeds = np.empty((b, SEED_LEN), dtype=np.int32)
    pos = rng.integers(0, n - SEED_LEN, b)
    for i in range(b):
        if i % 3 == 2:
            seeds[i] = rng.integers(0, 4, SEED_LEN)  # probably absent
        else:
            seeds[i] = t[pos[i] : pos[i] + SEED_LEN]
    for i in range(with_n):
        seeds[i, rng.integers(0, SEED_LEN)] = 4
    return seeds, pos


def test_search_counts_match_bruteforce(setup):
    t, fm, idx, sa, search, resolve = setup
    rng = np.random.default_rng(1)
    seeds, _ = make_seeds(t, rng, 64, with_n=4)
    valid = np.ones(64, dtype=bool)
    valid[60:] = False
    top, bot = search(idx, jnp.asarray(seeds), jnp.asarray(valid))
    top, bot = np.asarray(top), np.asarray(bot)
    for i in range(64):
        if not valid[i] or (seeds[i] >= 4).any():
            assert bot[i] - top[i] == 0
        else:
            assert bot[i] - top[i] == naive_search(t, seeds[i].astype(np.int8)), i


def test_search_then_resolve_gives_true_positions(setup):
    t, fm, idx, sa, search, resolve = setup
    rng = np.random.default_rng(2)
    seeds, pos = make_seeds(t, rng, 32)
    valid = np.ones(32, dtype=bool)
    top, bot = search(idx, jnp.asarray(seeds), jnp.asarray(valid))
    top, bot = np.asarray(top), np.asarray(bot)
    # enumerate all elements of all ranges, resolve, compare to SA
    rows, expect = [], []
    for i in range(32):
        for r in range(top[i], bot[i]):
            rows.append(r)
            expect.append(sa[r])
    rows = np.array(rows, dtype=np.int32)
    pad = (-len(rows)) % 64
    rows_p = np.concatenate([rows, np.zeros(pad, np.int32)])
    valid_p = np.concatenate([np.ones(len(rows), bool), np.zeros(pad, bool)])
    offs = np.asarray(resolve(idx, jnp.asarray(rows_p), jnp.asarray(valid_p)))
    assert np.array_equal(offs[: len(rows)], np.array(expect))
    # each true sampled position must be among resolutions of its seed range
    for i in range(32):
        if (seeds[i] == t[pos[i] : pos[i] + SEED_LEN]).all():
            got = set(sa[r] for r in range(top[i], bot[i]))
            assert pos[i] in got


def test_resolve_all_rows_exhaustive(setup):
    t, fm, idx, sa, search, resolve = setup
    nrows = fm.nrows
    pad = (-nrows) % 128
    rows = np.concatenate([np.arange(nrows, dtype=np.int32), np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(nrows, bool), np.zeros(pad, bool)])
    offs = np.asarray(jax.jit(resolve_rows)(idx, jnp.asarray(rows), jnp.asarray(valid)))
    assert np.array_equal(offs[:nrows], sa)


def test_search_seed_shorter_than_ftab_k(setup):
    """Seeds shorter than the index's ftab k-mer take the fchr-init path
    (startSearchSeedBi's fallback, aligner_seed.cpp:769-776) — needed now
    that big genomes default to ftab_k=12 while -L may go as low as 3."""
    t, fm, idx, sa, search, resolve = setup  # index built with ftab_k=6
    rng = np.random.default_rng(7)
    for slen in (3, 5):  # both < ftab_k
        b = 32
        seeds = np.empty((b, slen), dtype=np.int32)
        pos = rng.integers(0, len(t) - slen, b)
        for i in range(b):
            if i % 3 == 2:
                seeds[i] = rng.integers(0, 4, slen)
            else:
                seeds[i] = t[pos[i] : pos[i] + slen]
        valid = np.ones(b, dtype=bool)
        top, bot = search_seeds(idx, jnp.asarray(seeds), jnp.asarray(valid))
        top, bot = np.asarray(top), np.asarray(bot)
        for i in range(b):
            assert bot[i] - top[i] == naive_search(
                t, seeds[i].astype(np.int8)
            ), (slen, i)


def test_wide_ftab_k12_matches_k6(setup):
    """A k=12 jump table gives identical ranges to the k=6 index."""
    t, fm, idx, sa, search, resolve = setup
    fm12 = build_index_from_text(t, None, ftab_k=12)
    idx12 = DeviceIndex.from_host(fm12)
    rng = np.random.default_rng(13)
    seeds, _ = make_seeds(t, rng, 48, with_n=2)
    valid = np.ones(48, dtype=bool)
    t6, b6 = search_seeds(idx, jnp.asarray(seeds), jnp.asarray(valid))
    t12, b12 = search_seeds(idx12, jnp.asarray(seeds), jnp.asarray(valid))
    t6, b6 = np.asarray(t6), np.asarray(b6)
    t12, b12 = np.asarray(t12), np.asarray(b12)
    # widths agree everywhere; rows agree wherever the range is nonempty
    # (empty lanes stop at whatever row the last live step left them on,
    # which legitimately depends on where the jump landed)
    np.testing.assert_array_equal(b6 - t6, b12 - t12)
    nz = b6 > t6
    np.testing.assert_array_equal(t6[nz], t12[nz])
