"""Batched exact-match FM backward search over seed lanes.

TPU-native analog of the reference's lockstep seed-search kernel
(SeedAligner::searchSeedBi<SS_SIZE>, aligner_seed.cpp:820-957, with the
ftab jump of startSearchSeedBi, aligner_seed.cpp:757-811). The fork runs 8
seeds in interleaved lockstep to hide memory latency; here every lane of a
[B]-wide batch advances in lockstep per LF step, with dead lanes masked
instead of swap-compacted (fixed shapes for XLA).

The fork supports exact seeds only (mmSeeds throws for mms>0,
aligner_seed.h:356-369), so a seed containing N can never match and is
invalidated up front.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rank


def pack_kmer(seed_tail: jnp.ndarray) -> jnp.ndarray:
    """[B, k] codes -> packed 4-ary int32 key (first char = high digits)."""
    k = seed_tail.shape[-1]
    w = (4 ** jnp.arange(k - 1, -1, -1, dtype=jnp.int32))[None, :]
    return jnp.sum(jnp.clip(seed_tail, 0, 3).astype(jnp.int32) * w, axis=-1)


def search_seeds(idx, seeds: jnp.ndarray, valid: jnp.ndarray):
    """Exact backward search of fixed-length seeds.

    seeds: int32/int8 [B, L] codes (4 = N); valid: bool [B].
    Returns (top, bot) int32 [B]; empty lanes have top == bot.
    """
    seeds = seeds.astype(jnp.int32)
    B, L = seeds.shape
    k = idx.ftab_k

    has_n = jnp.any(seeds >= 4, axis=-1)
    alive = valid & ~has_n
    rowdt = idx.fchr.dtype
    zero = jnp.zeros((), rowdt)

    if L >= k:
        # ftab jump on the last k chars (backward search starts at seed end)
        q = pack_kmer(seeds[:, L - k :])
        ft, fb = rank.ftab_lookup(idx, q)
        top = jnp.where(alive, ft, zero)
        bot = jnp.where(alive, fb, zero)
        nsteps = L - k
    else:
        # seed shorter than the ftab k-mer (e.g. -L below the index's
        # ftab chars): start from the C-array row range of the LAST char
        # (startSearchSeedBi's fchr fallback, aligner_seed.cpp:769-776)
        # and LF through the remaining L-1 chars
        c_last = seeds[:, L - 1]
        top = jnp.where(alive, rank.small_lookup(idx.fchr, c_last, 4), zero)
        bot = jnp.where(
            alive, rank.small_lookup(idx.fchr, c_last + 1, 5), zero
        )
        nsteps = L - 1

    def step(i, carry):
        top, bot = carry
        # walk right-to-left over the remaining chars
        pos = nsteps - 1 - i
        c = jax.lax.dynamic_index_in_dim(seeds, pos, axis=1, keepdims=False)
        live = bot > top
        ntop, nbot = rank.lf_range(idx, c, top, bot)
        top = jnp.where(live, ntop, top)
        bot = jnp.where(live, nbot, top)
        return top, bot

    if nsteps > 0:
        top, bot = jax.lax.fori_loop(0, nsteps, step, (top, bot))
    bot = jnp.maximum(top, bot)
    empty = ~alive
    zero = jnp.zeros((), top.dtype)
    return jnp.where(empty, zero, top), jnp.where(empty, zero, bot)


def search_resolve_seeds(idx, seeds: jnp.ndarray, valid: jnp.ndarray,
                         cap: int, expand: float = 4):
    """Fused seed search + SA resolution in ONE device dispatch (the fork
    splits these into phases P4/P6 with host work between,
    bt2_search.cpp:2638/2683; on a remote device each round-trip costs more
    than the kernel, so fuse them).

    For each seed the first min(width, cap) SA rows are compacted (cumsum
    scatter) into a flat buffer of int(S*expand) slots and resolved to
    joined offsets (expand may be fractional: after seed dedupe the slot
    demand is typically ~0.3 slots/lane, and the resolve walk's cost is
    linear in the slot count). Returns (top, bot, starts, offs) with seed
    s's offsets at offs[starts[s] : starts[s] + min(bot-top, cap)[s]];
    seeds whose slots spill past the buffer have starts[s] + width >
    int(S*expand) (host retries the chunk with a wider buffer).
    """
    from .walk import resolve_rows

    top, bot = search_seeds(idx, seeds, valid)
    rowdt = top.dtype
    S = seeds.shape[0]
    width = jnp.minimum(bot - top, cap)
    rmax = int(S * expand)
    starts = jnp.cumsum(width) - width
    k = jnp.arange(cap, dtype=rowdt)[None, :]
    rows2d = top[:, None] + k
    live = k < width[:, None]
    slots = starts[:, None] + k
    slots = jnp.where(live & (slots < rmax), slots, rmax)  # rmax = dump slot
    rows_flat = jnp.zeros(rmax + 1, rowdt).at[slots.reshape(-1)].set(
        rows2d.reshape(-1)
    )[:rmax]
    total = jnp.minimum(starts[-1] + width[-1], rmax)
    rvalid = jnp.arange(rmax, dtype=rowdt) < total
    offs = resolve_rows(idx, rows_flat, rvalid)
    return top, bot, starts, offs
