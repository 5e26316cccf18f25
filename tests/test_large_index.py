"""Large-index (64-bit row) path: forcing int64 rows on a small genome
must produce identical alignments to the int32 path — the analog of the
reference's large_idx.py crossing the 2^32 boundary (scripts/test/
README.md:24-29, .bt2l format bt2_idx.cpp:29-37)."""

import os

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner


def test_int64_rows_same_results():
    rng = np.random.default_rng(61)
    text = rng.integers(0, 4, 15000).astype(np.int8)
    joined, refmap = join_references(["chrL"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    reads = []
    for i in range(24):
        pos = int(rng.integers(0, len(text) - 100))
        seq = text[pos : pos + 100].copy()
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(5, 95))
            seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(Read(i, f"L{i}", seq.astype(np.int8),
                          rng.integers(20, 40, 100).astype(np.uint8)))
    base = TPUAligner(fm).align_batch(reads)
    import jax

    os.environ["BT2TPU_FORCE_LARGE"] = "1"
    try:
        al64 = TPUAligner(fm)
        assert al64._use_fused_rank  # int64 rides the fused device path
        wide = al64.align_batch(reads)
        # and must not have silently fallen back to the host stage
        assert al64._use_fused_rank
    finally:
        del os.environ["BT2TPU_FORCE_LARGE"]
        jax.config.update("jax_enable_x64", False)  # don't leak into other tests
    for a, b in zip(base, wide):
        assert (a.status, a.refoff, a.fw, a.score, a.mapq,
                tuple(a.cigar)) == (b.status, b.refoff, b.fw, b.score,
                                    b.mapq, tuple(b.cigar))
