""".bt2 / .bt2l index import.

Reads the reference's index format (header field order per
Ebwt::readIntoMemory, bt2_io.cpp:134-400: endian word, len, lineRate,
linesPerSide, offRate, ftabChars, flags, nPat, plen[], nFrag, rstarts[],
ebwt sides, zOff, fchr, ftab, eftab; side layout = sideBwtSz packed-BWT
bytes + 4 occ counts, EbwtParams bt2_idx.h:112-166; 2-bit packing low bits
first, bitpack.h:30-49), recovers the joined text by native inverse BWT
(the LF-walk bowtie2-inspect performs) and rebuilds the TPU-blocked layout
with SA-IS. Existing bowtie2 indexes therefore load as-is; .npz remains
the native container.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..native import inverse_bwt
from ..utils import dna
from .builder import build_index_from_text
from .fasta import ReferenceMap
from .format import FMIndex


def _read_header(f, off_t):
    """Returns dict of header fields; f positioned after header."""
    one = struct.unpack("<I", f.read(4))[0]
    if one != 1:
        raise ValueError("big-endian .bt2 indexes are not supported")
    off_size = 8 if off_t == "q" else 4
    len_ = struct.unpack("<" + ("Q" if off_size == 8 else "I"), f.read(off_size))[0]
    line_rate, _lines_per_side, off_rate, ftab_chars, flags = struct.unpack(
        "<iiiii", f.read(20)
    )
    return dict(
        len=len_, line_rate=line_rate, off_rate=off_rate,
        ftab_chars=ftab_chars, flags=flags, off_size=off_size,
    )


def _read_arr(f, dtype, count):
    a = np.frombuffer(f.read(int(count) * dtype().nbytes), dtype=dtype)
    if len(a) != count:
        raise ValueError("truncated .bt2 file")
    return a


def load_bt2_index(basename: str, ftab_k: int = 10, srate: int = 16) -> FMIndex:
    """Load `basename`.1.bt2(l) (+ companion files implied), convert to the
    TPU FMIndex. Only the forward index is needed (the .rev mirror serves
    bowtie2's bidirectional search; the TPU engine searches backward only)."""
    large = False
    p1 = basename + ".1.bt2"
    if not os.path.exists(p1):
        p1 = basename + ".1.bt2l"
        large = True
        if not os.path.exists(p1):
            raise FileNotFoundError(f"{basename}.1.bt2(l) not found")
    u_t = np.uint64 if large else np.uint32

    with open(p1, "rb") as f:
        hdr = _read_header(f, "q" if large else "i")
        n = int(hdr["len"])
        bwt_len = n + 1
        line_sz = 1 << hdr["line_rate"]
        side_sz = line_sz
        off_size = hdr["off_size"]
        side_bwt_sz = side_sz - 4 * off_size
        num_sides = (((n + 3) // 4 + 1) + side_bwt_sz - 1) // side_bwt_sz
        ebwt_tot = num_sides * side_sz

        npat = int(_read_arr(f, u_t, 1)[0])
        plen = _read_arr(f, u_t, npat).astype(np.int64)
        nfrag = int(_read_arr(f, u_t, 1)[0])
        rstarts = _read_arr(f, u_t, nfrag * 3).astype(np.int64).reshape(-1, 3)
        sides = _read_arr(f, np.uint8, ebwt_tot).reshape(num_sides, side_sz)
        zoff = int(_read_arr(f, u_t, 1)[0])
        fchr = _read_arr(f, u_t, 5).astype(np.int64)
        # skip ftab (4^k + 1) and eftab (2*ftabChars), then read the
        # NUL-terminated, newline-separated refnames (bt2_io.cpp:496-510)
        ftab_len = (1 << (2 * hdr["ftab_chars"])) + 1
        f.seek((ftab_len + 2 * hdr["ftab_chars"]) * off_size, 1)
        raw = f.read().split(b"\x00")[0]
        refnames = [t.decode() for t in raw.split(b"\n") if t]

    # decode packed BWT bytes (low 2 bits = first base, bitpack.h:36-39)
    bwt_bytes = sides[:, :side_bwt_sz].reshape(-1)
    codes = np.empty(len(bwt_bytes) * 4, np.uint8)
    for i in range(4):
        codes[i::4] = (bwt_bytes >> (2 * i)) & 3
    bwt = codes[:bwt_len]

    # recover joined text and rebuild in the TPU layout
    text = inverse_bwt(bwt, zoff, sentinel_last=True).astype(np.int8)

    # refmap from plen + rstarts (joined off, refid, off within ref;
    # bt2_io.cpp:283-307). Fragment lengths = gaps between joined starts.
    order = np.argsort(rstarts[:, 0], kind="stable")
    rs = rstarts[order]
    frag_joined = rs[:, 0]
    frag_refid = rs[:, 1].astype(np.int32)
    frag_ref = rs[:, 2]
    ends = np.concatenate([frag_joined[1:], [n]])
    frag_len = ends - frag_joined
    if len(refnames) != npat:
        refnames = [f"seq{i}" for i in range(npat)]
    refmap = ReferenceMap(
        refnames=refnames,
        reflens=plen,
        frag_joined=frag_joined,
        frag_ref=frag_ref,
        frag_refid=frag_refid,
        frag_len=frag_len,
    )
    return build_index_from_text(text, refmap, ftab_k=ftab_k, srate=srate)
