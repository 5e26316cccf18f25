"""Batched FM-index rank / LF-mapping device ops.

The reference's hot op (ref: countBt2Side / mapLF / mapBiLFEx,
bt2_idx.h:1811-2472) counts base c in BWT[0:i) via per-side checkpoints +
popcount with an XOR mask trick (countInU64Ex, bt2_idx.h:2029-2083). Here the
same math is expressed as fixed-shape batched gathers over the blocked layout
in index/format.py: one [B]-lane query gathers its 128-row block (8 uint32
words + 4 checkpoint counts) and reduces with masked popcounts on the VPU.

All ops take a DeviceIndex and int32 row vectors; everything is jittable
with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..index.format import OCC_BLOCK, WORD_BASES, WORDS_PER_BLOCK

_EVEN = jnp.uint32(0x55555555)
_FULL = jnp.uint32(0xFFFFFFFF)


def _pair_limit_mask(nbases):
    """uint32 mask selecting the even (pair-flag) bits of the first
    `nbases` 2-bit pairs of a word; nbases in [0, 16]."""
    nb = jnp.clip(nbases, 0, WORD_BASES)
    sh = jnp.where(nb >= WORD_BASES, 0, 2 * nb).astype(jnp.uint32)
    part = (jnp.uint32(1) << sh) - jnp.uint32(1)
    return jnp.where(nb >= WORD_BASES, _FULL, part) & _EVEN


def _count_pairs_eq(words, c, limit_masks):
    """Count 2-bit pairs equal to c within the masked region.

    words: uint32 [..., W]; c: int32 broadcastable to [...]; limit_masks:
    uint32 [..., W] from _pair_limit_mask. XOR-mask trick: pair == c iff
    (pair ^ c) == 0; OR the two bits of each pair down onto the even bit.
    """
    cmask = jnp.uint32(0x55555555) * c.astype(jnp.uint32)
    x = words ^ cmask[..., None]
    y = x | (x >> 1)
    z = jnp.bitwise_not(y) & limit_masks
    return jax.lax.population_count(z).astype(jnp.int32).sum(axis=-1)


def _block_coords(rows):
    b = rows // OCC_BLOCK
    k = rows % OCC_BLOCK
    return b, k


def _word_limits(k):
    """Per-word base counts for an in-block offset k: [..., W] in [0,16]."""
    j = jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32) * WORD_BASES
    return jnp.clip(k[..., None] - j, 0, WORD_BASES)


def occ(idx, c, rows):
    """occ(c, row) = #{i < row : BWT[i] == c}, batched.

    c, rows: int32 [B]. Adjusts for the dummy char (stored as 0) at zoff
    (ref: Ebwt's $-handling around _zOff, bt2_idx.h:2372-2424).
    """
    b, k = _block_coords(rows)
    words = idx.bwt_blocks[b]  # [B, W]
    cp = idx.occ_cp[b, c]  # [B]
    limits = _pair_limit_mask(_word_limits(k))
    cnt = cp + _count_pairs_eq(words, c, limits)
    adj = ((c == 0) & (rows > idx.zoff)).astype(jnp.int32)
    return cnt - adj


def occ_all(idx, rows):
    """occ for all 4 chars at once: int32 [B, 4] (ref: mapBiLFEx's 4-way
    count, bt2_idx.h:2431-2472)."""
    b, k = _block_coords(rows)
    words = idx.bwt_blocks[b]  # [B, W]
    cp = idx.occ_cp[b]  # [B, 4]
    limits = _pair_limit_mask(_word_limits(k))  # [B, W]
    cs = jnp.arange(4, dtype=jnp.int32)
    cnt = jax.vmap(
        lambda c: _count_pairs_eq(words, jnp.broadcast_to(c, rows.shape), limits),
        out_axes=-1,
    )(cs)
    cnt = cp + cnt
    adj = (rows > idx.zoff).astype(jnp.int32)
    return cnt.at[:, 0].add(-adj)


def lf(idx, c, rows):
    """LF step for char c: fchr[c] + occ(c, row)."""
    return idx.fchr[c] + occ(idx, c, rows)


def lf_range(idx, c, top, bot):
    """Backward-search range update: new [top, bot) for prepended char c."""
    both = jnp.concatenate([top, bot])
    cc = jnp.concatenate([c, c])
    res = lf(idx, cc, both)
    n = top.shape[0]
    return res[:n], res[n:]


def bwt_char(idx, rows):
    """The BWT char at each row (dummy 0 at zoff; callers exclude zoff)."""
    b, k = _block_coords(rows)
    w = idx.bwt_blocks[b, k // WORD_BASES]
    return ((w >> (2 * (k % WORD_BASES)).astype(jnp.uint32)) & 3).astype(jnp.int32)


def lf_row(idx, rows):
    """LF of a single row via its own BWT char (group-walk step; invalid at
    zoff — the walk kernel never steps from zoff because it is marked)."""
    c = bwt_char(idx, rows)
    return lf(idx, c, rows)


def mark_rank(idx, rows):
    """(marked, rank): is `row` SA-sampled, and how many sampled rows
    precede it (rank into sa_sample)."""
    b = rows // OCC_BLOCK
    k = rows % OCC_BLOCK
    mwords = idx.mark_blocks[b]  # [B, MW]
    mw = mwords.shape[-1]
    j = jnp.arange(mw, dtype=jnp.int32) * 32
    nb = jnp.clip(k[..., None] - j, 0, 32)
    sh = jnp.where(nb >= 32, 0, nb).astype(jnp.uint32)
    part = (jnp.uint32(1) << sh) - jnp.uint32(1)
    masks = jnp.where(nb >= 32, _FULL, part)
    cnt = jax.lax.population_count(mwords & masks).astype(jnp.int32).sum(axis=-1)
    rank = idx.mark_cp[b] + cnt
    wsel = jnp.take_along_axis(mwords, (k // 32)[..., None], axis=-1)[..., 0]
    marked = ((wsel >> (k % 32).astype(jnp.uint32)) & 1).astype(jnp.bool_)
    return marked, rank
