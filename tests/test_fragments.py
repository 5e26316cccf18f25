"""Multi-reference and N-fragment edge cases: joined-text bookkeeping,
fragment-boundary rejection (joinedToTextOff semantics, bt2_idx.cpp:54-128)
and per-reference coordinates in SAM."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
from omp_bowtie2_prime_tpu.utils import dna


@pytest.fixture(scope="module")
def multi():
    rng = np.random.default_rng(71)
    s1 = rng.integers(0, 4, 4000).astype(np.int8)
    s2 = rng.integers(0, 4, 6000).astype(np.int8)
    s2[2000:2100] = 4  # N gap splits chr2 into two fragments
    joined, refmap = join_references(["chr1", "chr2"], [s1.copy(), s2.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    return s1, s2, fm, TPUAligner(fm)


def mk(seq, name="r"):
    return Read(0, name, np.asarray(seq, np.int8),
                np.full(len(seq), 35, np.uint8))


def test_second_reference_coordinates(multi):
    s1, s2, fm, al = multi
    res = al.align_batch([mk(s2[3000:3100])])[0]
    assert res.status == "aligned"
    assert fm.refmap.refnames[res.refid] == "chr2"
    assert res.refoff == 3000


def test_fragment_after_n_gap(multi):
    s1, s2, fm, al = multi
    res = al.align_batch([mk(s2[2500:2600])])[0]
    assert res.status == "aligned"
    assert fm.refmap.refnames[res.refid] == "chr2"
    assert res.refoff == 2500


def test_read_spanning_ref_boundary_rejected(multi):
    """A read stitched from the end of chr1 + start of chr2 matches the
    joined text but must NOT be reported (fragment straddle)."""
    s1, s2, fm, al = multi
    fake = np.concatenate([s1[-50:], s2[:50]])
    res = al.align_batch([mk(fake)])[0]
    assert res.status == "unaligned"


def test_read_spanning_n_gap_rejected(multi):
    s1, s2, fm, al = multi
    fake = np.concatenate([s2[1950:2000], s2[2100:2150]])
    res = al.align_batch([mk(fake)])[0]
    assert res.status == "unaligned"


def test_read_with_ns_aligns_with_penalty(multi):
    s1, s2, fm, al = multi
    seq = s1[1000:1100].copy()
    seq[50] = 4  # N in the read: -1, still aligns
    res = al.align_batch([mk(seq)])[0]
    assert res.status == "aligned" and res.refoff == 1000 and res.score == -1
