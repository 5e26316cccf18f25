"""Pallas TPU kernel for the banded end-to-end Smith-Waterman DP.

The hand-scheduled variant of ops/sw.py's XLA formulation (same recurrence:
row scan with prefix-max read-gap state; see that module's docstring and
the reference kernels it replaces, aligner_swsse_ee_u8.cpp:398-536). The
kernel tiles the problem batch onto the grid; each tile's H/F carries and
the packed trace-bit tensor live in VMEM for the whole row loop, so HBM
traffic is one input read + one packed-tb write per tile instead of one
carry round-trip per row.

Mosaic notes (worked around deliberately):
  - column shifts use pltpu.roll + column masks (lane-dim concatenates of
    odd widths miscompile when combined with multiple live loop carries);
  - trace bits pack 8 DP rows x 4 bits per int32, stored [L/8, TB, C]
    (dynamic stores index the leading untiled dim; uint8 tiles can't);
  - per-row read chars are fetched by masked reduction (dynamic lane-dim
    ref slices don't lower);
  - argmax lowers only for f32, so first-argmax is a masked column min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import NEG, SWParams

TB = 256  # problems per grid tile


def _dp_kernel(reads_ref, pens_ref, rdlens_ref, refs_ref, wlens_ref,
               best_ref, bestcol_ref, tb_ref, p: SWParams, L: int, C: int):
    reads = reads_ref[:].astype(jnp.int32)  # [TB, L]
    pens = pens_ref[:].astype(jnp.int32)
    refs = refs_ref[:].astype(jnp.int32)  # [TB, C] (col 0 = dummy 4)
    rdlens = rdlens_ref[:].astype(jnp.int32)  # [TB, 1]
    wlens = wlens_ref[:].astype(jnp.int32)

    B = reads.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    col0 = cols == 0
    col_ok = cols <= wlens
    k_ext = cols * p.rdg_ext
    rdlens_bc = jnp.broadcast_to(rdlens, (B, C))

    h0 = jnp.where(col_ok, 0, NEG).astype(jnp.int32)
    f0 = jnp.full((B, C), NEG, jnp.int32)
    hfin0 = jnp.full((B, C), NEG, jnp.int32)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    def sr(x, k):  # shift right by k columns, NEG fill
        return jnp.where(cols < k, NEG, pltpu.roll(x, k, 1))

    def body(i, carry):
        h_prev, f_prev, hfin, acc = carry
        # fetch read char/penalty i-1 by masked reduction
        sel = lidx == (i - 1)
        rc = jnp.sum(jnp.where(sel, reads, 0), axis=1, keepdims=True)
        pm = jnp.sum(jnp.where(sel, pens, 0), axis=1, keepdims=True)
        s = jnp.where(
            (rc >= 4) | (refs >= 4), -p.npen,
            jnp.where(refs == rc, 0, -pm),
        ).astype(jnp.int32)  # [B, C]; col 0 garbage (masked below)

        gap_ok = (i > p.gbar) & (i <= rdlens_bc - p.gbar)
        gmask = jnp.where(gap_ok, 0, NEG).astype(jnp.int32)

        f = jnp.maximum(h_prev - p.rfg_open + gmask, f_prev - p.rfg_ext)
        f = jnp.maximum(f, NEG)

        diag = jnp.where(col0, NEG, sr(h_prev, 1) + s)
        h_open = jnp.maximum(diag, f)

        # prefix max via log-step rolls
        scan = h_open + k_ext
        sh = 1
        while sh < C:
            scan = jnp.maximum(scan, sr(scan, sh))
            sh *= 2
        e = jnp.where(
            col0, NEG, sr(scan, 1) - p.rdg_open - k_ext + p.rdg_ext + gmask
        )
        e = jnp.maximum(e, NEG)

        h = jnp.maximum(h_open, e)
        h = jnp.where(col_ok, jnp.maximum(h, NEG), NEG)

        b0 = (diag >= h).astype(jnp.int32)
        b1 = (f >= h).astype(jnp.int32)
        b2 = ((h_prev - p.rfg_open + gmask) >= f).astype(jnp.int32)
        lo = jnp.where(col0, 0, (sr(h, 1) - p.rdg_open + gmask) >= e).astype(
            jnp.int32
        )
        row_bits = b0 | (b1 << 1) | (b2 << 2) | (lo << 3)
        # packed trace words: 8 DP rows x 4 bits per int32, [L/8, TB, C].
        # The current word rides in a loop carry and stores every row
        # (overwriting-in-place is cheaper than the load+or+store RMW:
        # one VMEM op per row instead of two)
        # lax.div/rem (truncating; i >= 1 so equal to floor) instead of
        # Python // and %: the floor ops lower through a `sign` fallback
        # that Mosaic re-traces at lowering time under the GLOBAL dtype
        # config — with jax_enable_x64 on (large-index path) that
        # re-trace emits int64 and Mosaic raises/recurses
        i32 = jnp.int32
        d = jax.lax.div(i - i32(1), i32(8))
        shift = i32(4) * jax.lax.rem(i - i32(1), i32(8))
        word = row_bits << shift
        acc = jnp.where(shift == 0, word, acc | word)
        tb_ref[pl.ds(d, 1), :, :] = acc[None, :, :]

        hfin = jnp.where(cols * 0 + i == rdlens_bc, h, hfin)
        return h, f, hfin, acc

    _, _, hfin, _ = jax.lax.fori_loop(
        1, L + 1, body, (h0, f0, hfin0, jnp.zeros_like(h0))
    )
    best = jnp.max(hfin, axis=1, keepdims=True)
    best_ref[:] = best
    # first-argmax via masked column-min (integer argmax doesn't lower)
    bestcol_ref[:] = jnp.min(
        jnp.where(hfin == jnp.broadcast_to(best, hfin.shape), cols,
                  jnp.int32(1 << 30)),
        axis=1, keepdims=True,
    )


@functools.partial(jax.jit, static_argnums=5)
def sw_e2e_tb_pallas(reads, pen_mm, rdlens, refs, wlens, p: SWParams):
    """Pallas DP + packed trace bits.

    Returns (best [B], bestcol [B], tbp [B, L/8, C] int32) where word
    (l//8) holds rows 8k..8k+7, 4 bits each (bit layout as ops/sw.py
    sw_e2e_tb_batch)."""
    # Trace under x32 semantics regardless of the global flag: the
    # large-index (int64, .bt2l-scale) pipeline enables jax_enable_x64
    # globally, which turns the kernel's weak-typed literals into int64
    # and Mosaic cannot lower 64-bit (it recursed in
    # convert_element_type before raising). Every input here is int32,
    # so x32 tracing is exact.
    with jax.enable_x64(False):
        return _sw_e2e_tb_pallas_body(reads, pen_mm, rdlens, refs, wlens,
                                      p)


def _sw_e2e_tb_pallas_body(reads, pen_mm, rdlens, refs, wlens, p):
    B, L = reads.shape
    W = refs.shape[1]
    C = W + 1
    LP = (L + 7) // 8
    assert B % TB == 0 and L % 8 == 0
    # refs shifted so column j scores text char of DP column j (col 0 dummy)
    refs_c = jnp.pad(refs.astype(jnp.int32), ((0, 0), (1, 0)),
                     constant_values=4)
    grid = (B // TB,)
    kernel = functools.partial(_dp_kernel, p=p, L=L, C=C)
    best, bestcol, tb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LP, TB, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((LP, B, C), jnp.int32),
        ],
    )(reads.astype(jnp.int32), pen_mm.astype(jnp.int32),
      rdlens.astype(jnp.int32)[:, None], refs_c,
      wlens.astype(jnp.int32)[:, None])
    return best[:, 0], bestcol[:, 0], jnp.transpose(tb, (1, 0, 2))


def _dp_local_kernel(reads_ref, pens_ref, rdlens_ref, refs_ref, wlens_ref,
                     best_ref, brow_ref, bcol_ref, tb_ref, tb4_ref,
                     p: SWParams, L: int, C: int):
    """Local-mode variant of _dp_kernel (reference analog: the swsse_loc_*
    kernels the fork deleted; semantics = ops/sw.py sw_local_tb_batch):
    match bonus, zero floor on H, all-cell best tracking (ties -> smallest
    row then column), and an extra H==0 stop bit packed 32 rows per int32
    in a second trace tensor."""
    reads = reads_ref[:].astype(jnp.int32)  # [TB, L]
    pens = pens_ref[:].astype(jnp.int32)
    refs = refs_ref[:].astype(jnp.int32)  # [TB, C] (col 0 = dummy 4)
    rdlens = rdlens_ref[:].astype(jnp.int32)  # [TB, 1]
    wlens = wlens_ref[:].astype(jnp.int32)

    B = reads.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    col0 = cols == 0
    col_ok = cols <= wlens
    k_ext = cols * p.rdg_ext
    rdlens_bc = jnp.broadcast_to(rdlens, (B, C))

    h0 = jnp.where(col_ok, 0, NEG).astype(jnp.int32)
    f0 = jnp.full((B, C), NEG, jnp.int32)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    zero1 = jnp.zeros((B, 1), jnp.int32)

    def sr(x, k):  # shift right by k columns, NEG fill
        return jnp.where(cols < k, NEG, pltpu.roll(x, k, 1))

    def body(i, carry):
        h_prev, f_prev, best, brow, bcol, acc, acc4 = carry
        sel = lidx == (i - 1)
        rc = jnp.sum(jnp.where(sel, reads, 0), axis=1, keepdims=True)
        pm = jnp.sum(jnp.where(sel, pens, 0), axis=1, keepdims=True)
        s = jnp.where(
            (rc >= 4) | (refs >= 4), -p.npen,
            jnp.where(refs == rc, p.ma, -pm),
        ).astype(jnp.int32)  # [B, C]; col 0 garbage (masked below)

        gap_ok = (i > p.gbar) & (i <= rdlens_bc - p.gbar)
        gmask = jnp.where(gap_ok, 0, NEG).astype(jnp.int32)

        f = jnp.maximum(h_prev - p.rfg_open + gmask, f_prev - p.rfg_ext)
        f = jnp.maximum(f, NEG)

        diag = jnp.where(col0, NEG, sr(h_prev, 1) + s)
        h_open = jnp.maximum(diag, f)

        scan = h_open + k_ext
        sh = 1
        while sh < C:
            scan = jnp.maximum(scan, sr(scan, sh))
            sh *= 2
        e = jnp.where(
            col0, NEG, sr(scan, 1) - p.rdg_open - k_ext + p.rdg_ext + gmask
        )
        e = jnp.maximum(e, NEG)

        # the 0 floor: any cell may start a fresh local alignment (E
        # sources below 0 can't surface through the floor — see the XLA
        # formulation's induction note, ops/sw.py)
        h = jnp.maximum(jnp.maximum(h_open, e), 0)
        h = jnp.where(col_ok, h, NEG)

        b0 = (diag >= h).astype(jnp.int32)
        b1 = (f >= h).astype(jnp.int32)
        b2 = ((h_prev - p.rfg_open + gmask) >= f).astype(jnp.int32)
        lo = jnp.where(col0, 0, (sr(h, 1) - p.rdg_open + gmask) >= e).astype(
            jnp.int32
        )
        row_bits = b0 | (b1 << 1) | (b2 << 2) | (lo << 3)
        i32 = jnp.int32
        d = jax.lax.div(i - i32(1), i32(8))
        shift = i32(4) * jax.lax.rem(i - i32(1), i32(8))
        word = row_bits << shift
        acc = jnp.where(shift == 0, word, acc | word)
        tb_ref[pl.ds(d, 1), :, :] = acc[None, :, :]

        # H==0 local-start bit, 32 DP rows per int32 word
        b4 = (h == 0).astype(jnp.int32)
        d4 = jax.lax.div(i - i32(1), i32(32))
        sh4 = jax.lax.rem(i - i32(1), i32(32))
        w4 = b4 << sh4
        acc4 = jnp.where(sh4 == 0, w4, acc4 | w4)
        tb4_ref[pl.ds(d4, 1), :, :] = acc4[None, :, :]

        # all-cell best tracking over real rows; strict > keeps the
        # earliest row, masked column-min the smallest column (integer
        # argmax doesn't lower)
        hm = jnp.where(col_ok & (rdlens_bc >= i), h, NEG)
        rowbest = jnp.max(hm, axis=1, keepdims=True)
        rowcol = jnp.min(
            jnp.where(hm == jnp.broadcast_to(rowbest, hm.shape), cols,
                      jnp.int32(1 << 30)),
            axis=1, keepdims=True,
        )
        upd = rowbest > best
        best = jnp.where(upd, rowbest, best)
        brow = jnp.where(upd, zero1 + i, brow)
        bcol = jnp.where(upd, rowcol, bcol)
        return h, f, best, brow, bcol, acc, acc4

    _, _, best, brow, bcol, _, _ = jax.lax.fori_loop(
        1, L + 1, body,
        (h0, f0, zero1, zero1, zero1, jnp.zeros_like(h0), jnp.zeros_like(h0)),
    )
    best_ref[:] = best
    brow_ref[:] = brow
    bcol_ref[:] = bcol


@functools.partial(jax.jit, static_argnums=5)
def sw_local_tb_pallas(reads, pen_mm, rdlens, refs, wlens, p: SWParams):
    """Pallas local DP + packed trace bits. Returns (best [B], bestrow [B],
    bestcol [B], tbp [B, L/8, C] int32, tb4p [B, ceil(L/32), C] int32)
    where tbp packs trace bits 0-3 as sw_e2e_tb_pallas and tb4p packs the
    H==0 stop bit, 32 rows per word."""
    with jax.enable_x64(False):
        return _sw_local_tb_pallas_body(reads, pen_mm, rdlens, refs, wlens,
                                        p)


def _sw_local_tb_pallas_body(reads, pen_mm, rdlens, refs, wlens, p):
    B, L = reads.shape
    W = refs.shape[1]
    C = W + 1
    LP = (L + 7) // 8
    LP4 = (L + 31) // 32
    # The local kernel carries a second trace tensor (the H==0 stop
    # bits) on top of the e2e layout, and Mosaic double-buffers every
    # grid-tiled operand in scoped VMEM (16 MB stack limit) with the
    # lane dim padded to 128 — at TB=256, L=160, C~200+ the tile set
    # is ~16.5 MB and the compile aborts with a scoped-vmem stack OOM
    # (seen on v5e via the axon relay). Halve the tile batch until the
    # estimate fits; output identity is tile-size independent.
    tbs = TB
    cpad = -(-C // 128) * 128
    lpad = -(-L // 128) * 128

    def _vmem_est(t):
        # double-buffered grid operands + ~8 (TB, C) loop carries
        return 4 * t * (2 * (LP + LP4) * cpad + 2 * 2 * lpad + 3 * cpad
                        + 8 * cpad)

    while tbs > 64 and _vmem_est(tbs) > 13 * (1 << 20):
        tbs //= 2
    assert B % tbs == 0 and L % 8 == 0
    refs_c = jnp.pad(refs.astype(jnp.int32), ((0, 0), (1, 0)),
                     constant_values=4)
    grid = (B // tbs,)
    kernel = functools.partial(_dp_local_kernel, p=p, L=L, C=C)
    best, brow, bcol, tb, tb4 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tbs, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tbs, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tbs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tbs, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tbs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tbs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tbs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tbs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LP, tbs, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LP4, tbs, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((LP, B, C), jnp.int32),
            jax.ShapeDtypeStruct((LP4, B, C), jnp.int32),
        ],
    )(reads.astype(jnp.int32), pen_mm.astype(jnp.int32),
      rdlens.astype(jnp.int32)[:, None], refs_c,
      wlens.astype(jnp.int32)[:, None])
    return (best[:, 0], brow[:, 0], bcol[:, 0],
            jnp.transpose(tb, (1, 0, 2)), jnp.transpose(tb4, (1, 0, 2)))


def sw_local_backtrace_pallas(reads, pen_mm, rdlens, refs, wlens,
                              p: SWParams):
    """Pallas local DP + the same on-device walk as ops/sw.py
    sw_local_backtrace_batch, reading packed trace words. Drop-in for
    that function (same 6-tuple)."""
    best, brow, bcol, tbp, tb4p = sw_local_tb_pallas(
        reads, pen_mm, rdlens, refs, wlens, p
    )
    B, L = reads.shape
    C = refs.shape[1] + 1
    MAXOPS = L + C
    tbf = tbp.reshape(B, tbp.shape[1] * C)
    tb4f = tb4p.reshape(B, tb4p.shape[1] * C)

    def step(k, carry):
        i, j, state, ops = carry
        li = jnp.clip(i - 1, 0, L - 1)
        word = jnp.take_along_axis(
            tbf, ((li // 8) * C + j)[:, None], axis=1
        )[:, 0]
        bits = (word >> (4 * (li % 8))) & 0xF
        w4 = jnp.take_along_axis(
            tb4f, ((li // 32) * C + j)[:, None], axis=1
        )[:, 0]
        b4 = (w4 >> (li % 32)) & 1
        in_h = state == 0
        # stop on read start OR a 0-valued H cell reached in H state
        done = (i <= 0) | (in_h & (b4 > 0))
        m_ok = in_h & ((bits & 1) > 0) & (j > 0)
        f_br = (state == 1) | (in_h & ~m_ok & ((bits & 2) > 0))
        op = jnp.where(done, 0, jnp.where(m_ok, 1, jnp.where(f_br, 2, 3)))
        e_br = ~m_ok & ~f_br
        ops = jax.lax.dynamic_update_slice_in_dim(
            ops, op.astype(jnp.uint8)[:, None], k, axis=1
        )
        ni = jnp.where(done | e_br, i, i - 1)
        nj = jnp.where(done | f_br, j, j - 1)
        nstate = jnp.where(
            done, state,
            jnp.where(
                m_ok, 0,
                jnp.where(
                    f_br,
                    jnp.where((bits & 4) > 0, 0, 1),
                    jnp.where((bits & 8) > 0, 0, 2),
                ),
            ),
        )
        return ni, nj, nstate, ops

    init = (
        brow.astype(jnp.int32),
        bcol.astype(jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros((B, MAXOPS), jnp.uint8),
    )
    i_fin, j_fin, _, ops = jax.lax.fori_loop(0, MAXOPS, step, init)
    from .sw import pack_ops2

    return best, brow, bcol, pack_ops2(ops), j_fin, i_fin


def sw_e2e_backtrace_pallas(reads, pen_mm, rdlens, refs, wlens, p: SWParams):
    """Pallas DP + the same on-device walk as ops/sw.py, reading packed
    trace words. Drop-in for sw.sw_e2e_backtrace_batch."""
    best, bestcol, tbp = sw_e2e_tb_pallas(reads, pen_mm, rdlens, refs, wlens, p)
    B, L = reads.shape
    C = refs.shape[1] + 1
    LP = tbp.shape[1]
    MAXOPS = L + C
    tbf = tbp.reshape(B, LP * C)

    def step(k, carry):
        i, j, state, ops = carry
        done = i <= 0
        li = jnp.clip(i - 1, 0, L - 1)
        word = jnp.take_along_axis(
            tbf, ((li // 8) * C + j)[:, None], axis=1
        )[:, 0]
        bits = (word >> (4 * (li % 8))) & 0xF
        in_h = state == 0
        m_ok = in_h & ((bits & 1) > 0) & (j > 0)
        f_br = (state == 1) | (in_h & ~m_ok & ((bits & 2) > 0))
        e_br = ~m_ok & ~f_br
        op = jnp.where(done, 0, jnp.where(m_ok, 1, jnp.where(f_br, 2, 3)))
        ops = jax.lax.dynamic_update_slice_in_dim(
            ops, op.astype(jnp.uint8)[:, None], k, axis=1
        )
        ni = jnp.where(done | e_br, i, i - 1)
        nj = jnp.where(done | f_br, j, j - 1)
        nstate = jnp.where(
            done, state,
            jnp.where(
                m_ok, 0,
                jnp.where(
                    f_br,
                    jnp.where((bits & 4) > 0, 0, 1),
                    jnp.where((bits & 8) > 0, 0, 2),
                ),
            ),
        )
        return ni, nj, nstate, ops

    init = (
        rdlens.astype(jnp.int32),
        bestcol.astype(jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros((B, MAXOPS), jnp.uint8),
    )
    _, j_fin, _, ops = jax.lax.fori_loop(0, MAXOPS, step, init)
    from .sw import pack_ops2

    return best, bestcol, pack_ops2(ops), j_fin
