"""Seeded stratified row sampling over wide SA ranges — the batched
analog of the reference's RowSampler/Random1toN weighted random element
draw (aligner_sw_driver.cpp:151-259, random_util.h).  Ranges wider than
range_cap must yield picks spread across the WHOLE range (round 1 took
the first cap rows of every range, concentrating deep-repeat placements
on a fixed subset of copies), deterministically in (range, --seed)."""

import numpy as np

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import AlignOpts, TPUAligner


def _repeat_genome(ncopies=50, unit_len=400, seed=11):
    rng = np.random.default_rng(seed)
    unit = rng.integers(0, 4, unit_len).astype(np.int8)
    parts = []
    starts = []
    pos = 0
    for _ in range(ncopies):
        spacer = rng.integers(0, 4, 200).astype(np.int8)
        parts.append(spacer)
        pos += len(spacer)
        starts.append(pos)
        parts.append(unit)
        pos += unit_len
    parts.append(rng.integers(0, 4, 500).astype(np.int8))
    return np.concatenate(parts), unit, np.asarray(starts)


def _mkreads(unit, n, rng, ln=100):
    reads = []
    for i in range(n):
        off = int(rng.integers(0, len(unit) - ln))
        reads.append(Read(rdid=i, name=f"u{i}-{off}",
                          seq=unit[off : off + ln].copy(),
                          qual=np.full(ln, 35, np.uint8)))
    return reads


def test_wide_range_picks_spread_across_copies():
    text, unit, starts = _repeat_genome()
    joined, refmap = join_references(["rep"], [text])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    al = TPUAligner(fm)
    rng = np.random.default_rng(3)
    reads = _mkreads(unit, 300, rng)
    res = al.align_batch(reads)
    aligned = [r for r in res if r.status == "aligned"]
    assert len(aligned) == len(reads)
    # which repeat copy did each read land in?
    copies = set()
    for rd, r in zip(reads, res):
        off = int(rd.name.split("-")[1])
        hit = np.searchsorted(starts, r.refoff - off + 1) - 1
        copies.add(int(hit))
        assert r.mapq <= 1  # 50-way multi-mapper
    # round-1 behavior capped the reachable copies at range_cap=16 fixed
    # SA rows; sampled ranges must reach far more of the 50 copies
    assert len(copies) > 25, f"picks concentrated: {sorted(copies)}"


def test_sampling_deterministic_and_seed_sensitive():
    text, unit, starts = _repeat_genome()
    joined, refmap = join_references(["rep"], [text])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    rng = np.random.default_rng(4)
    reads = _mkreads(unit, 40, rng)
    a1 = TPUAligner(fm).align_batch(reads)
    a2 = TPUAligner(fm).align_batch(reads)
    assert [r.refoff for r in a1] == [r.refoff for r in a2]
    a3 = TPUAligner(fm, opts=AlignOpts(rng_seed=77)).align_batch(reads)
    diff = sum(1 for x, y in zip(a1, a3) if x.refoff != y.refoff)
    assert diff > 5  # --seed reshuffles wide-range candidate rows


def test_narrow_ranges_unaffected():
    """Ranges within range_cap resolve fully — sampling must not change
    unique-genome alignment."""
    rng = np.random.default_rng(9)
    text = rng.integers(0, 4, 60000).astype(np.int8)
    joined, refmap = join_references(["u"], [text])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    al = TPUAligner(fm)
    reads = []
    for i in range(60):
        pos = int(rng.integers(0, len(text) - 100))
        reads.append(Read(rdid=i, name=f"r{i}-{pos}",
                          seq=text[pos : pos + 100].copy(),
                          qual=np.full(100, 35, np.uint8)))
    res = al.align_batch(reads)
    for rd, r in zip(reads, res):
        assert r.status == "aligned"
        assert r.refoff == int(rd.name.split("-")[1])
        assert r.mapq >= 23
