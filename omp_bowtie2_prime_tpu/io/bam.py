"""BAM input parsing (ref: the fork's htslib-based BAM PatternSource,
pat.h/pat.cpp BAMPatternSource).

BGZF is valid multi-member gzip, so Python's gzip module decompresses it
directly; records are decoded with struct/numpy. Only what read input
needs is extracted: name, sequence, qualities (and the mate flags for
paired streams). 4-bit packed bases decode through the =ACMGRSVTWYHKDBN
code table; reads flagged reverse-complemented in a coordinate-sorted BAM
are restored to original orientation.
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterator

import numpy as np

from ..utils import dna
from .fastq import Read, _strip_mate_suffix

# 4-bit BAM base codes -> our 2-bit codes (4 = N/ambiguous)
_BAM_BASE = np.full(16, 4, np.int8)
_BAM_BASE[1] = 0  # A
_BAM_BASE[2] = 1  # C
_BAM_BASE[4] = 2  # G
_BAM_BASE[8] = 3  # T


def _records(path: str):
    with gzip.open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        (l_text,) = struct.unpack("<i", f.read(4))
        f.read(l_text)
        (n_ref,) = struct.unpack("<i", f.read(4))
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", f.read(4))
            f.read(l_name + 4)
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                return
            (block_size,) = struct.unpack("<i", hdr)
            data = f.read(block_size)
            if len(data) < block_size:
                return
            yield data


def read_bam(path: str, start_id: int = 0) -> Iterator[Read]:
    """Yield reads from a BAM file (alignment state ignored; reverse-flag
    records are restored to original strand)."""
    rdid = start_id
    for data in _records(path):
        (refid, pos, l_qname, mapq, bam_bin, n_cigar, flag, l_seq,
         nrefid, npos, tlen) = struct.unpack("<iiBBHHHiiii", data[:32])
        off = 32
        name = data[off : off + l_qname - 1].decode()
        off += l_qname
        off += 4 * n_cigar
        nb = (l_seq + 1) // 2
        packed = np.frombuffer(data[off : off + nb], np.uint8)
        off += nb
        codes = np.empty(nb * 2, np.int8)
        codes[0::2] = _BAM_BASE[(packed >> 4) & 0xF]
        codes[1::2] = _BAM_BASE[packed & 0xF]
        codes = codes[:l_seq]
        qual = np.frombuffer(data[off : off + l_seq], np.uint8).copy()
        off += l_seq
        if qual.size and qual[0] == 0xFF:
            qual = np.full(l_seq, 30, np.uint8)
        if flag & 0x10:  # stored reverse-complemented: restore
            codes = dna.revcomp(codes)
            qual = qual[::-1]
        if flag & 0x100 or flag & 0x800:
            continue  # skip secondary/supplementary records
        yield Read(rdid, _strip_mate_suffix(name), codes.copy(), qual)
        rdid += 1


def read_bam_pairs(path: str, start_id: int = 0):
    """Pair up mates from a name-adjacent BAM (mate1 flag 0x40 first)."""
    pend: dict = {}
    rdid = start_id
    for rd_flag in _bam_with_flags(path):
        rd, flag = rd_flag
        if not flag & 0x1:
            continue
        key = rd.name
        if key in pend:
            other, oflag = pend.pop(key)
            first, second = (other, rd) if oflag & 0x40 else (rd, other)
            first.rdid = second.rdid = rdid
            rdid += 1
            yield first, second
        else:
            pend[key] = (rd, flag)


def _bam_with_flags(path: str):
    rdid = 0
    for data in _records(path):
        (refid, pos, l_qname, mapq, bam_bin, n_cigar, flag, l_seq,
         nrefid, npos, tlen) = struct.unpack("<iiBBHHHiiii", data[:32])
        if flag & 0x100 or flag & 0x800:
            continue
        off = 32
        name = data[off : off + l_qname - 1].decode()
        off += l_qname + 4 * n_cigar
        nb = (l_seq + 1) // 2
        packed = np.frombuffer(data[off : off + nb], np.uint8)
        off += nb
        codes = np.empty(nb * 2, np.int8)
        codes[0::2] = _BAM_BASE[(packed >> 4) & 0xF]
        codes[1::2] = _BAM_BASE[packed & 0xF]
        codes = codes[:l_seq]
        qual = np.frombuffer(data[off : off + l_seq], np.uint8).copy()
        if qual.size and qual[0] == 0xFF:
            qual = np.full(l_seq, 30, np.uint8)
        if flag & 0x10:
            codes = dna.revcomp(codes)
            qual = qual[::-1]
        yield Read(rdid, _strip_mate_suffix(name), codes.copy(), qual), flag
        rdid += 1
