""".bt2 index import: format parsing + inverse-BWT text recovery.

Synthesizes a .1.bt2 the same way bowtie2-build's buildToDisk lays it out
(header fields bt2_io.cpp:134-226, sides = sideBwtSz packed bytes + 4 occ
counts bt2_idx.h:160-166, $-sorts-last row convention) and checks the
importer recovers the exact text and reference map.
"""

import struct

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.native import sais_available
from omp_bowtie2_prime_tpu.utils import dna

pytestmark = pytest.mark.skipif(
    not sais_available(), reason="native btcore unavailable"
)


def bt2_sa_bwt(text: np.ndarray):
    """SA and BWT under bowtie2's convention: sentinel sorts LAST."""
    n = len(text)
    key = np.concatenate([text.astype(np.int8), [5]])  # $ larger than codes
    sa = sorted(range(n + 1), key=lambda i: list(key[i:]))
    bwt = np.zeros(n + 1, np.uint8)
    zoff = -1
    for r, s in enumerate(sa):
        if s == 0:
            zoff = r  # $ position, stored as code 0
        else:
            bwt[r] = text[s - 1]
    return np.array(sa), bwt, zoff


def write_bt2_1(path, text, refname="synth", line_rate=6):
    n = len(text)
    sa, bwt, zoff = bt2_sa_bwt(text)
    side_sz = 1 << line_rate
    side_bwt = side_sz - 16
    num_sides = ((n + 3) // 4 + 1 + side_bwt - 1) // side_bwt
    packed = np.zeros(num_sides * side_bwt, np.uint8)
    for i in range(4):
        lane = bwt[i::4]
        packed[: len(lane)] |= (lane << (2 * i)).astype(np.uint8)
    cnt = np.bincount(text, minlength=4)
    fchr = np.concatenate([[0], np.cumsum(cnt)]).astype(np.uint32)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<I", n))
        f.write(struct.pack("<iiiii", line_rate, 2, 4, 10, -1))
        f.write(struct.pack("<I", 1))  # nPat
        f.write(struct.pack("<I", n))  # plen
        f.write(struct.pack("<I", 1))  # nFrag
        f.write(struct.pack("<III", 0, 0, 0))  # rstarts
        # sides: occ counts unused by the importer; write zeros
        for s in range(num_sides):
            f.write(packed[s * side_bwt : (s + 1) * side_bwt].tobytes())
            f.write(b"\x00" * 16)
        f.write(struct.pack("<I", zoff))
        f.write(fchr.tobytes())
        ftab_len = (1 << 20) + 1
        f.write(b"\x00" * 4 * (ftab_len + 20))  # ftab + eftab (skipped)
        f.write(refname.encode() + b"\x00")


def test_bt2_import_roundtrip(tmp_path):
    from omp_bowtie2_prime_tpu.index.bt2io import load_bt2_index

    rng = np.random.default_rng(31)
    text = rng.integers(0, 4, 5000).astype(np.int8)
    write_bt2_1(str(tmp_path / "syn.1.bt2"), text, refname="chrSyn")
    fm = load_bt2_index(str(tmp_path / "syn"))
    assert fm.n == len(text)
    assert fm.refmap.refnames == ["chrSyn"]
    rec = dna.unpack_2bit(fm.ref_words, fm.n)
    np.testing.assert_array_equal(rec, text)


def test_bt2_import_aligns(tmp_path):
    from omp_bowtie2_prime_tpu.index.bt2io import load_bt2_index
    from omp_bowtie2_prime_tpu.io.fastq import Read
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner

    rng = np.random.default_rng(32)
    text = rng.integers(0, 4, 8000).astype(np.int8)
    write_bt2_1(str(tmp_path / "syn.1.bt2"), text)
    fm = load_bt2_index(str(tmp_path / "syn"), ftab_k=8)
    al = TPUAligner(fm)
    reads = []
    truth = []
    for i in range(10):
        pos = int(rng.integers(0, len(text) - 100))
        reads.append(Read(i, f"r{i}", text[pos : pos + 100].copy(),
                          np.full(100, 35, np.uint8)))
        truth.append(pos)
    res = al.align_batch(reads)
    for r, pos in zip(res, truth):
        assert r.status == "aligned" and r.refoff == pos


def test_bt2_write_read_roundtrip(tmp_path):
    """save_bt2 -> load_bt2_index round-trips text, names and fragments
    (the writer's byte-level fidelity is separately validated against
    bowtie2-build output and consumed by the reference binary)."""
    from omp_bowtie2_prime_tpu.index.bt2io import load_bt2_index, save_bt2
    from omp_bowtie2_prime_tpu.index.fasta import join_references

    rng = np.random.default_rng(77)
    seq1 = rng.integers(0, 4, 3000).astype(np.int8)
    seq2 = rng.integers(0, 4, 2000).astype(np.int8)
    seq2[500:520] = 4  # N gap -> two fragments
    joined, refmap = join_references(["chrA desc text", "chrB"],
                                     [seq1, seq2])
    save_bt2(joined, refmap, str(tmp_path / "w"))
    fm = load_bt2_index(str(tmp_path / "w"))
    assert fm.n == len(joined)
    assert fm.refmap.refnames == ["chrA desc text", "chrB"]
    rec = dna.unpack_2bit(fm.ref_words, fm.n)
    np.testing.assert_array_equal(rec, joined)
    np.testing.assert_array_equal(fm.refmap.frag_len, refmap.frag_len)
    np.testing.assert_array_equal(fm.refmap.frag_ref, refmap.frag_ref)


def test_bt2l_write_read_roundtrip(tmp_path):
    """Large-index (.bt2l, 64-bit TIndexOffU, 128-byte sides with 4 u64
    occ checkpoints — bt2_idx.cpp:29-37) write -> read round-trip; the
    byte-level fidelity vs bowtie2-build-l is validated separately
    (DIFFERENTIAL.md: all six lambda files identical)."""
    from omp_bowtie2_prime_tpu.index.bt2io import load_bt2_index, save_bt2
    from omp_bowtie2_prime_tpu.index.fasta import join_references

    rng = np.random.default_rng(78)
    seq1 = rng.integers(0, 4, 3000).astype(np.int8)
    seq2 = rng.integers(0, 4, 2000).astype(np.int8)
    seq2[700:730] = 4  # N gap -> two fragments
    joined, refmap = join_references(["chrA", "chrB"], [seq1, seq2])
    save_bt2(joined, refmap, str(tmp_path / "wl"), large=True)
    import os
    assert os.path.exists(tmp_path / "wl.1.bt2l")
    assert not os.path.exists(tmp_path / "wl.1.bt2")
    fm = load_bt2_index(str(tmp_path / "wl"))
    assert fm.n == len(joined)
    rec = dna.unpack_2bit(fm.ref_words, fm.n)
    np.testing.assert_array_equal(rec, joined)
    np.testing.assert_array_equal(fm.refmap.frag_len, refmap.frag_len)

    # small and large encode the same index: identical device behavior
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
    from omp_bowtie2_prime_tpu.io.fastq import Read

    save_bt2(joined, refmap, str(tmp_path / "ws"))
    fm_s = load_bt2_index(str(tmp_path / "ws"))
    reads = []
    for i in range(16):
        p = int(rng.integers(0, 2900))
        reads.append(Read(0, f"r{i}", seq1[p : p + 80].copy(),
                          np.full(80, 40, np.uint8)))
    ra = TPUAligner(fm).align_batch(reads)
    rb = TPUAligner(fm_s).align_batch(reads)
    for a, b in zip(ra, rb):
        assert (a.status, a.refid, a.refoff, a.score) == (
            b.status, b.refid, b.refoff, b.score
        )
