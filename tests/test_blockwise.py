"""Bounded-memory blockwise build (index/blockwise.py): difference
covers, streamed SA identity vs SA-IS, and byte-identical FMIndex
output — the --bmax/--bmaxdivn/--dcv capability of the reference's
KarkkainenBlockwiseSA (blockwise_sa.h:255+, diff_sample.h)."""

import dataclasses

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.blockwise import (
    _is_cover, _xtab, build_index_blockwise, difference_cover, sa_blocks,
)
from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.utils.suffix_array import suffix_array


@pytest.mark.parametrize("v", [3, 7, 16, 32, 64, 128, 1024, 2048, 4096])
def test_difference_cover_valid(v):
    D = difference_cover(v)
    assert _is_cover(v, D)
    # xtab really yields double-cover witnesses
    xt = _xtab(v, D)
    inD = np.zeros(v, bool)
    inD[D] = True
    for c in (0, 1, v // 2, v - 1):
        assert inD[xt[c]] and inD[(xt[c] + c) % v]


def _stress_text(rng, n):
    text = rng.integers(0, 4, n).astype(np.int8)
    text[n // 2 : n // 2 + n // 10] = text[: n // 10]  # long repeat
    text[n // 4 : n // 4 + n // 40] = 2  # homopolymer run
    return text


@pytest.mark.parametrize("n,v,bmax", [(4000, 16, 600), (30000, 64, 2500),
                                      (120000, 512, 11000)])
def test_sa_blocks_match_sais(n, v, bmax):
    rng = np.random.default_rng(n)
    text = _stress_text(rng, n)
    sa_ref = suffix_array(text).astype(np.int64)
    blocks = list(sa_blocks(text, bmax=bmax, dcv=v))
    assert sum(len(b) for b in blocks) == n + 1
    assert np.array_equal(np.concatenate(blocks), sa_ref)


def test_blockwise_index_byte_identical():
    rng = np.random.default_rng(77)
    text = _stress_text(rng, 150000)
    joined, rm = join_references(["c"], [text])
    a = build_index_from_text(joined, rm)
    b = build_index_blockwise(joined, rm, bmax=13000, dcv=256)
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if isinstance(va, np.ndarray):
            assert va.dtype == vb.dtype and np.array_equal(va, vb), f.name
        elif f.name != "refmap":
            assert va == vb, f.name


def test_cli_build_bmax(tmp_path):
    from omp_bowtie2_prime_tpu.cli import main
    from omp_bowtie2_prime_tpu.index.format import FMIndex

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 30000))
    fa = tmp_path / "r.fa"
    fa.write_text(f">r\n{seq}\n")
    main(["build", "--bmaxdivn", "8", "--dcv", "64", str(fa),
          str(tmp_path / "bw.npz")])
    main(["build", str(fa), str(tmp_path / "full.npz")])
    a = FMIndex.load(str(tmp_path / "full.npz"))
    b = FMIndex.load(str(tmp_path / "bw.npz"))
    assert np.array_equal(a.bwt_words, b.bwt_words)
    assert np.array_equal(a.sa_sample, b.sa_sample)
    assert np.array_equal(a.ftab_top, b.ftab_top)
