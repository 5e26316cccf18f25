"""Read input parsing: FASTQ/FASTA (ref: pat.cpp format parsers).

Host-side; the aligner consumes fixed-size batches of Read objects. An
async prefetch wrapper (the analog of PatternSourceReadAheadFactory,
pat.h:1283-1402) lives in models/pipeline.py.
"""

from __future__ import annotations

import dataclasses
import gzip
from typing import Iterable, Iterator

import numpy as np

from ..utils import dna


@dataclasses.dataclass
class Read:
    rdid: int
    name: str
    seq: np.ndarray  # int8 codes, N=4
    qual: np.ndarray  # uint8 phred (already -33'd)

    def __len__(self) -> int:
        return len(self.seq)


def _open(path: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def read_fastq(path: str, start_id: int = 0) -> Iterator[Read]:
    rdid = start_id
    with _open(path) as f:
        while True:
            h = f.readline()
            if not h:
                return
            h = h.strip()
            if not h:
                continue
            seq = f.readline().strip()
            f.readline()  # +
            qual = f.readline().strip()
            name = h[1:].split()[0] if len(h) > 1 else f"read{rdid}"
            q = np.frombuffer(qual.encode("ascii"), dtype=np.uint8)
            q = np.maximum(q, 33) - 33
            yield Read(rdid, name, dna.encode(seq), q.astype(np.uint8))
            rdid += 1


def read_fasta_reads(path: str, start_id: int = 0) -> Iterator[Read]:
    rdid = start_id
    name, chunks = None, []
    with _open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    seq = dna.encode("".join(chunks))
                    yield Read(rdid, name, seq, np.full(len(seq), 30, np.uint8))
                    rdid += 1
                name = line[1:].split()[0] if len(line) > 1 else f"read{rdid}"
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            seq = dna.encode("".join(chunks))
            yield Read(rdid, name, seq, np.full(len(seq), 30, np.uint8))


def open_reads(path: str, start_id: int = 0) -> Iterator[Read]:
    """Sniff FASTQ vs FASTA from the first byte."""
    with _open(path) as f:
        first = f.read(1)
    if first == ">":
        return read_fasta_reads(path, start_id)
    return read_fastq(path, start_id)


def batch_iterator(reads: Iterable[Read], batch: int) -> Iterator[list[Read]]:
    buf: list[Read] = []
    for r in reads:
        buf.append(r)
        if len(buf) == batch:
            yield buf
            buf = []
    if buf:
        yield buf
