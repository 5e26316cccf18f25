"""FM-index containers: host (numpy) and device (jnp pytree) layouts.

Device layout is TPU-first (not the reference's 48*OFF_SIZE-byte "sides",
bt2_idx.h:112-279): the BWT is 2-bit packed into uint32 words grouped in
OCC_BLOCK=128-row blocks, with absolute occ checkpoints per block, so a
rank query is one block-row gather + 8 masked popcounts — a pure
vector-unit operation with no horizontal dependencies.

SA sampling is by TEXT position (every row whose SA value % srate == 0 is
marked in a bitmap with its own rank checkpoints). Unlike the reference's
row-index sampling (bt2_idx.h offs[]), this bounds every group-walk to
srate-1 LF steps, which is what makes a fixed-shape device walk kernel
possible (ref behavior: Ebwt::getOffset, bt2_idx.cpp:149-171 walks an
unbounded number of steps).
"""

from __future__ import annotations

import dataclasses
import pickle

import numpy as np
from flax import struct

OCC_BLOCK = 128  # BWT rows per occ checkpoint block
WORD_BASES = 16  # 2-bit bases per uint32 word
WORDS_PER_BLOCK = OCC_BLOCK // WORD_BASES  # 8
MARK_WORDS_PER_BLOCK = OCC_BLOCK // 32  # 4


@dataclasses.dataclass
class FMIndex:
    """Host-side FM index (numpy arrays)."""

    n: int  # joined text length
    nrows: int  # n + 1 (includes sentinel row)
    zoff: int  # row where SA == 0 (dummy BWT char stored there)
    fchr: np.ndarray  # [5] int64: C array; row range of char c is [fchr[c], fchr[c+1])
    bwt_words: np.ndarray  # [nblocks * WORDS_PER_BLOCK] uint32
    occ_cp: np.ndarray  # [nblocks, 4] int64 abs counts at block start
    ftab_k: int
    ftab_top: np.ndarray  # [4^k] uint32
    ftab_bot: np.ndarray  # [4^k] uint32
    srate: int  # SA sample rate (text positions)
    mark_words: np.ndarray  # [nblocks * MARK_WORDS_PER_BLOCK] uint32 bitmap
    mark_cp: np.ndarray  # [nblocks] int64 marked-row count before block
    sa_sample: np.ndarray  # [nmarked] uint32: SA values of marked rows, row order
    ref_words: np.ndarray  # joined text 2-bit packed, uint32
    refmap: object  # ReferenceMap (host only)

    @property
    def nblocks(self) -> int:
        return self.occ_cp.shape[0]

    def save(self, path: str) -> None:
        arrs = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if isinstance(getattr(self, f.name), np.ndarray)
        }
        scalars = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if isinstance(getattr(self, f.name), int)
        }
        np.savez_compressed(
            path,
            __scalars__=np.frombuffer(pickle.dumps(scalars), dtype=np.uint8),
            __refmap__=np.frombuffer(pickle.dumps(self.refmap), dtype=np.uint8),
            **arrs,
        )

    @classmethod
    def load(cls, path: str) -> "FMIndex":
        z = np.load(path, allow_pickle=False)
        scalars = pickle.loads(z["__scalars__"].tobytes())
        refmap = pickle.loads(z["__refmap__"].tobytes())
        arrs = {k: z[k] for k in z.files if not k.startswith("__")}
        return cls(refmap=refmap, **scalars, **arrs)


@struct.dataclass
class DeviceIndex:
    """Device-resident FM index (a jax pytree of arrays).

    int32 row indices: genomes up to 2^31-1 joined bases (GRCh38-scale needs
    the int64 variant, a later milestone mirroring the reference's .bt2l).
    """

    bwt_blocks: object  # [nblocks, WORDS_PER_BLOCK] uint32
    occ_cp: object  # [nblocks, 4] int32
    fchr: object  # [5] int32
    ftab_top: object  # [4^k] int32
    ftab_bot: object  # [4^k] int32
    mark_blocks: object  # [nblocks, MARK_WORDS_PER_BLOCK] uint32
    mark_cp: object  # [nblocks] int32
    sa_sample: object  # [nmarked] int32
    ref_words: object  # [nrefwords] uint32
    zoff: object  # [] int32
    nrows: object  # [] int32
    ftab_k: int = struct.field(pytree_node=False, default=10)
    srate: int = struct.field(pytree_node=False, default=16)

    @classmethod
    def from_host(cls, fm: FMIndex) -> "DeviceIndex":
        import jax.numpy as jnp

        return cls(
            bwt_blocks=jnp.asarray(
                fm.bwt_words.reshape(-1, WORDS_PER_BLOCK), dtype=jnp.uint32
            ),
            occ_cp=jnp.asarray(fm.occ_cp, dtype=jnp.int32),
            fchr=jnp.asarray(fm.fchr, dtype=jnp.int32),
            ftab_top=jnp.asarray(fm.ftab_top, dtype=jnp.int32),
            ftab_bot=jnp.asarray(fm.ftab_bot, dtype=jnp.int32),
            mark_blocks=jnp.asarray(
                fm.mark_words.reshape(-1, MARK_WORDS_PER_BLOCK), dtype=jnp.uint32
            ),
            mark_cp=jnp.asarray(fm.mark_cp, dtype=jnp.int32),
            sa_sample=jnp.asarray(fm.sa_sample, dtype=jnp.int32),
            ref_words=jnp.asarray(fm.ref_words, dtype=jnp.uint32),
            zoff=jnp.asarray(fm.zoff, dtype=jnp.int32),
            nrows=jnp.asarray(fm.nrows, dtype=jnp.int32),
            ftab_k=fm.ftab_k,
            srate=fm.srate,
        )
