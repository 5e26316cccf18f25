"""Native SA-IS extension: equivalence with the numpy oracle and scaling
sanity (the reference's analog test surface is the --sanity SA checks and
libsais path, blockwise_sa.h:199-250)."""

import time

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.native import sais_available, suffix_array_sais
from omp_bowtie2_prime_tpu.utils.suffix_array import (
    _suffix_array_doubling, suffix_array,
)

pytestmark = pytest.mark.skipif(
    not sais_available(), reason="native btcore unavailable (no compiler)"
)


def test_sais_matches_doubling_small():
    rng = np.random.default_rng(5)
    for n in [1, 2, 3, 7, 50, 333, 5000]:
        t = rng.integers(0, 4, n).astype(np.int8)
        np.testing.assert_array_equal(
            suffix_array_sais(t), _suffix_array_doubling(t), err_msg=f"n={n}"
        )


def test_sais_repetitive_inputs():
    # repetitive strings stress the LMS naming/recursion path
    for t in [
        np.zeros(1000, np.int8),
        np.tile([0, 1], 700).astype(np.int8),
        np.tile([0, 0, 1, 2, 2, 1], 311).astype(np.int8),
        np.tile([3, 2, 1, 0], 500).astype(np.int8),
    ]:
        np.testing.assert_array_equal(
            suffix_array_sais(t), _suffix_array_doubling(t)
        )


def test_sais_is_default_and_fast():
    rng = np.random.default_rng(6)
    t = rng.integers(0, 4, 2_000_000).astype(np.int8)
    t0 = time.time()
    sa = suffix_array(t)
    dt = time.time() - t0
    assert dt < 20.0  # linear-time native path (numpy doubling takes minutes)
    # spot-verify suffix order at random positions
    order = sa[rng.integers(0, len(sa) - 1, 200)]
    for a, b in zip(order[:-1], order[1:]):
        pass  # adjacency in random sample is meaningless; verify below
    idx = rng.integers(1, len(sa), 500)
    for i in idx:
        a, b = int(sa[i - 1]), int(sa[i])
        # compare suffixes lexicographically over a bounded window
        wa = t[a : a + 64].tobytes()
        wb = t[b : b + 64].tobytes()
        assert wa <= wb
