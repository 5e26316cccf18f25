"""SAM emission (ref: sam.h/sam.cpp; AlnSink summary aln_sink.cpp:349-460).

Record layout, tag set and ordering match the reference's unpaired output:
AS, (XS), XN, XM, XO, XG, NM, MD, YT, (YF). The fork emits YF:Z:LN on every
unpaired record because its batched worker skips setAndComputeFilter for
rdlen<256 (bt2_search.cpp:2496-2524, default-false AlnFlags); the
`yf_ln_quirk` flag reproduces that for bitwise parity.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils import dna


@dataclasses.dataclass
class SamRecord:
    name: str
    flag: int
    rname: str = "*"
    pos: int = 0  # 1-based
    mapq: int = 0
    cigar: str = "*"
    seq: str = "*"
    qual: str = "*"
    tags: list = dataclasses.field(default_factory=list)

    def line(self) -> str:
        fields = [
            self.name,
            str(self.flag),
            self.rname,
            str(self.pos),
            str(self.mapq),
            self.cigar,
            "*",
            "0",
            "0",
            self.seq,
            self.qual,
        ] + [f"{t}:{ty}:{v}" for t, ty, v in self.tags]
        return "\t".join(fields)


class AlnSummary:
    """Counters for the end-of-run summary (ref: printAlSumm,
    aln_sink.cpp:349-460)."""

    def __init__(self):
        self.nreads = 0
        self.al0 = 0
        self.al1 = 0
        self.almany = 0

    def add(self, nhits: int):
        self.nreads += 1
        if nhits == 0:
            self.al0 += 1
        elif nhits == 1:
            self.al1 += 1
        else:
            self.almany += 1

    def render(self) -> str:
        n = max(1, self.nreads)
        pct = lambda x: f"{100.0 * x / n:.2f}%"
        rate = 100.0 * (self.al1 + self.almany) / n
        return (
            f"{self.nreads} reads; of these:\n"
            f"  {self.nreads} (100.00%) were unpaired; of these:\n"
            f"    {self.al0} ({pct(self.al0)}) aligned 0 times\n"
            f"    {self.al1} ({pct(self.al1)}) aligned exactly 1 time\n"
            f"    {self.almany} ({pct(self.almany)}) aligned >1 times\n"
            f"{rate:.2f}% overall alignment rate"
        )


class SamWriter:
    def __init__(self, out, refnames, reflens, prog_args: str = "", yf_ln_quirk=True):
        self.out = out
        self.refnames = list(refnames)
        self.reflens = list(int(x) for x in reflens)
        self.yf_ln_quirk = yf_ln_quirk
        self.summary = AlnSummary()
        self._prog_args = prog_args

    def write_header(self):
        w = self.out.write
        w("@HD\tVN:1.5\tSO:unsorted\tGO:query\n")
        for name, ln in zip(self.refnames, self.reflens):
            w(f"@SQ\tSN:{name}\tLN:{ln}\n")
        w(
            "@PG\tID:bowtie2\tPN:bowtie2\tVN:2.5.4\tCL:\""
            + self._prog_args
            + "\"\n"
        )

    def qual_str(self, qual: np.ndarray) -> str:
        return (np.asarray(qual, np.uint8) + 33).tobytes().decode("ascii")

    def write_aligned(
        self,
        read,
        fw: bool,
        refname: str,
        refoff0: int,
        mapq: int,
        cigar_str: str,
        score: int,
        secbest,  # int | None
        stats: dict,
        nhits_for_summary: int = 1,
    ):
        seq = read.seq if fw else dna.revcomp(read.seq)
        qual = read.qual if fw else read.qual[::-1]
        tags = [("AS", "i", score)]
        if secbest is not None:
            tags.append(("XS", "i", secbest))
        tags += [
            ("XN", "i", stats["xn"]),
            ("XM", "i", stats["xm"]),
            ("XO", "i", stats["xo"]),
            ("XG", "i", stats["xg"]),
            ("NM", "i", stats["nm"]),
            ("MD", "Z", stats["md"]),
            ("YT", "Z", "UU"),
        ]
        if self.yf_ln_quirk:
            tags.append(("YF", "Z", "LN"))
        rec = SamRecord(
            name=read.name,
            flag=0 if fw else 16,
            rname=refname,
            pos=refoff0 + 1,
            mapq=mapq,
            cigar=cigar_str,
            seq=dna.decode(seq),
            qual=self.qual_str(qual),
            tags=tags,
        )
        self.out.write(rec.line() + "\n")
        self.summary.add(nhits_for_summary)

    def write_unaligned(self, read, yf: str | None = None):
        tags = [("YT", "Z", "UU")]
        if yf is not None:
            tags.append(("YF", "Z", yf))
        elif self.yf_ln_quirk:
            tags.append(("YF", "Z", "LN"))
        rec = SamRecord(
            name=read.name,
            flag=4,
            seq=dna.decode(read.seq),
            qual=self.qual_str(read.qual),
            tags=tags,
        )
        self.out.write(rec.line() + "\n")
        self.summary.add(0)
