"""Columnar single-candidate finish (CandTable / _finalize_singles_table)
must be bitwise-identical to routing the same reads through the per-read
dict path — the identity the r5 finishRead vectorization rests on.  The
dict path is reproduced by converting the table back into Candidate dict
entries before finalization (exactly what the pre-r5 code did for every
read)."""

import types

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import AlignOpts, TPUAligner


def _mk(rng, text, n, readlen=100, with_ns=False, indels=True):
    reads = []
    from omp_bowtie2_prime_tpu.utils import dna

    for i in range(n):
        pos = int(rng.integers(0, len(text) - readlen - 8))
        seq = text[pos : pos + readlen].copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, readlen))
            seq[p] = (seq[p] + 1 + rng.integers(0, 3)) % 4
        if indels and rng.random() < 0.15:  # 1-2bp indel
            cut = int(rng.integers(20, readlen - 20))
            k = int(rng.integers(1, 3))
            seq = np.concatenate([seq[:cut],
                                  text[pos + cut + k : pos + readlen + k]])
        if with_ns and rng.random() < 0.1:
            seq[int(rng.integers(0, len(seq)))] = 4
        if rng.integers(0, 2):
            seq = dna.revcomp(seq)
        reads.append(Read(i, f"q{i}", np.ascontiguousarray(seq, np.int8),
                          rng.integers(20, 40, len(seq)).astype(np.uint8)))
    return reads


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(404)
    text = rng.integers(0, 4, 120_000).astype(np.int8)
    # a repeat family so some reads carry >1 candidate (dict path) while
    # most stay single-candidate (table path)
    text[60_000:60_400] = text[10_000:10_400]
    joined, refmap = join_references(["c1"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    return fm, text, rng


def _dictify(al):
    """Patch collect_candidates to fold the CandTable back into dicts —
    byte-for-byte the pre-columnar behavior."""
    orig = type(al).collect_candidates

    def wrapped(self, reads, minscs, active, roundi, predisp=None,
                after_dp=None, columnar=False):
        out = orig(self, reads, minscs, active, roundi, predisp=predisp,
                   after_dp=after_dp, columnar=columnar)
        if not columnar:
            return out
        cands, table = out
        if table is not None:
            for t in range(len(table)):
                c = table.candidate(t)
                cands[int(table.ri[t])][(c.fw, c.endj)] = c
        return cands, None

    al.collect_candidates = types.MethodType(wrapped, al)
    return al


def _key(r):
    return (r.status, r.fw, r.refid, r.refoff, r.score, r.secbest, r.mapq,
            r.cigar_str or "", tuple(r.cigar or []),
            r.stats.get("nm") if r.status == "aligned" else None,
            r.stats.get("md") if r.status == "aligned" else None,
            r.nhits, r.span)


def test_table_identity_e2e(genome):
    fm, text, _ = genome
    rng = np.random.default_rng(7)
    reads = _mk(rng, text, 600, with_ns=True)
    res_t = TPUAligner(fm).align_batch(reads)
    res_d = _dictify(TPUAligner(fm)).align_batch(reads)
    assert [_key(a) for a in res_t] == [_key(b) for b in res_d]
    assert sum(1 for r in res_t if r.status == "aligned") > 500


def test_table_identity_local(genome):
    fm, text, _ = genome
    rng = np.random.default_rng(8)
    reads = _mk(rng, text, 300)
    # clip-worthy tails: corrupt the last 12 bp of some reads
    for r in reads[::4]:
        r.seq[-12:] = (r.seq[-12:] + 1) % 4
    opts = AlignOpts(local=True)
    res_t = TPUAligner(fm, opts=opts).align_batch(reads)
    res_d = _dictify(TPUAligner(fm, opts=opts)).align_batch(reads)
    assert [_key(a) for a in res_t] == [_key(b) for b in res_d]
    soft = sum(1 for r in res_t
               if r.status == "aligned" and "S" in (r.cigar_str or ""))
    assert soft > 10  # local mode actually clipped something


def test_table_identity_khits(genome):
    fm, text, _ = genome
    rng = np.random.default_rng(9)
    reads = _mk(rng, text, 200)
    opts = AlignOpts(khits=3)
    res_t = TPUAligner(fm, opts=opts).align_batch(reads)
    res_d = _dictify(TPUAligner(fm, opts=opts)).align_batch(reads)
    assert [_key(a) for a in res_t] == [_key(b) for b in res_d]
