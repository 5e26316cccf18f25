"""Naive numpy FM-index operations used as test oracles."""

import numpy as np


def naive_occ(bwt: np.ndarray, zoff: int, c: int, i: int) -> int:
    """Count of char c in BWT[0:i), not counting the dummy at zoff."""
    cnt = int(np.sum(bwt[:i] == c))
    if c == bwt[zoff] and i > zoff:
        cnt -= 1
    return cnt


def naive_search(text: np.ndarray, pattern: np.ndarray) -> int:
    """Brute-force count of occurrences of pattern in text."""
    n, m = len(text), len(pattern)
    if m == 0 or m > n:
        return 0
    windows = np.lib.stride_tricks.sliding_window_view(text, m)
    return int(np.sum((windows == pattern).all(axis=1)))


def fm_backward_search(fm, pattern: np.ndarray) -> tuple[int, int]:
    """Backward search using host arrays with naive rank (oracle)."""
    from omp_bowtie2_prime_tpu.utils import dna

    bwt = dna.unpack_2bit(fm.bwt_words, fm.nrows)
    top, bot = 0, fm.nrows
    for c in pattern[::-1]:
        c = int(c)
        if c >= 4:
            return 0, 0
        top = int(fm.fchr[c]) + _occ(bwt, fm.zoff, c, top)
        bot = int(fm.fchr[c]) + _occ(bwt, fm.zoff, c, bot)
        if top >= bot:
            return top, top
    return top, bot


def _occ(bwt, zoff, c, i):
    cnt = int(np.sum(bwt[:i] == c))
    if c == 0 and i > zoff:  # dummy stored as 0 at zoff
        cnt -= 1
    return cnt
