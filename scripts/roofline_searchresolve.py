#!/usr/bin/env python3
"""searchResolve HBM-roofline measurement (VERDICT r3 item 5).

Is the gather-chain formulation of the fused seed-search+resolve mega at
memory speed-of-light, or would a hand-scheduled Pallas kernel (the
analog of the reference's ibatch=8 + SideLocus prefetch,
aligner_seed.h:1427-1431, bt2_idx.h:370-398) buy another step?

Method: on the real index at the requested scale,
  1. count the bytes the mega actually touches per batch from its static
     shape (lanes x (ftab row + 2 block rows/LF step) + slots x (srate
     block rows + SA row), 512 B tile rows — ops/rank.py _gather_block);
  2. time the REAL mega executable (searchResolve dispatch+wait) on a
     synthetic read batch;
  3. time a synthetic DEPENDENT gather chain of the same shape over the
     same idx.blocks array (the serial-LF data dependence is preserved:
     step i's rows derive from step i-1's gathered values) — this is the
     achievable bound for ANY implementation that must issue the same
     dependent 512 B row gathers, i.e. the gather-unit speed of light;
  4. time the same bytes as INDEPENDENT gathers (no chain) to show how
     much the dependence itself costs.

Prints bytes/read, achieved GB/s, bound GB/s, and the ratio. HBM peak
on v5e is ~819 GB/s; random 512 B row gathers cannot reach it — the
comparator that matters is (3).

Usage: PYTHONPATH=/root/repo python scripts/roofline_searchresolve.py
         [--size 3100000000] [--batch 32768] [--workdir /tmp/bt2prof]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=3_100_000_000)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--workdir", default="/tmp/bt2prof")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"## devices {jax.devices()}", flush=True)

    from omp_bowtie2_prime_tpu.index.format import FMIndex
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
    from profile_genome import synth_reads

    tag = f"{args.size//1_000_000}M"
    idx_path = os.path.join(args.workdir, f"idx{tag}.npz")
    txt_path = os.path.join(args.workdir, f"text{tag}.npy")
    t0 = time.time()
    fm = FMIndex.load(idx_path)
    text = np.load(txt_path)
    print(f"## load {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    reads = synth_reads(text, args.batch, 100, rng)

    al = TPUAligner(fm)
    al.align_batch(reads)  # warmup/compile
    o = al.opts

    # ---- static shape of the round-0 grid mega for this batch ----
    lens_c, ivals, npad = al._meta_host
    eff = np.minimum(lens_c, o.seed_len)
    nr = np.minimum(o.nrounds, ivals)
    start = (ivals * 0) // nr
    cnt = np.where((lens_c >= 1) & (start <= lens_c - eff),
                   (lens_c - eff - start) // ivals + 1, 0)
    G = int(cnt.sum())
    lanes = 2 * G
    S = 1 << max(13, (lanes - 1).bit_length())
    nsteps = o.seed_len - fm.ftab_k
    rmax = int(S * o.resolve_expand)
    BLK = 512  # DEV_BLOCK_U32 * 4 bytes
    search_bytes = S * (BLK + nsteps * 2 * BLK)
    walk_bytes = rmax * (fm.srate * BLK + BLK)
    total_bytes = search_bytes + walk_bytes
    print(f"## shape: reads={args.batch} lanes={lanes} S={S} "
          f"nsteps={nsteps} srate={fm.srate} rmax={rmax}", flush=True)
    print(f"## bytes/batch: search {search_bytes/1e9:.2f} GB + walk "
          f"{walk_bytes/1e9:.2f} GB = {total_bytes/1e9:.2f} GB "
          f"({total_bytes/args.batch/1e3:.1f} KB/read round-0)", flush=True)

    # ---- 1. the real mega (round 0 only, timed end to end) ----
    def run_mega():
        al.timers.reset()
        out = al._rank_frame_device_grid(
            list(range(args.batch)), 0, al._mgn_cache, al._rok_cache
        )
        return out

    # cache the per-read frame constants the aligner computes in
    # collect_candidates (we call the grid directly to isolate the phase)
    lens_all = al._mat_lens.astype(np.int64)
    sc = al.sc
    minscs = al.min_scores(reads)
    ukeys, uinv = np.unique(
        np.stack([lens_all, np.asarray(minscs).astype(np.int64)], 1),
        axis=0, return_inverse=True)
    mg_u = np.fromiter(
        (min(sc.max_read_gaps(int(ms), int(ln)), o.maxhalf)
         for ln, ms in ukeys), np.int64, len(ukeys))
    al._mgn_cache = mg_u[uinv]
    al._rok_cache = lens_all <= o.l_hard

    run_mega()  # warm
    dts = []
    for _ in range(args.iters):
        t0 = time.time()
        run_mega()
        dts.append(time.time() - t0)
    t_mega = min(dts)
    gbs_mega = total_bytes / t_mega / 1e9
    print(f"## mega: best {t_mega*1e3:.1f} ms of "
          f"{[round(x*1e3) for x in dts]} -> {gbs_mega:.1f} GB/s "
          f"(counted bytes / wall)", flush=True)

    # ---- 3. dependent gather chain, same shape, same array ----
    blocks = al.idx.blocks
    nblk = blocks.shape[0]

    def chain(i0, K, B):
        def body(_, i):
            rows = blocks[i]
            s = jnp.sum(rows.astype(jnp.uint32), axis=-1)
            return ((i + s) % nblk).astype(i0.dtype)

        return jax.lax.fori_loop(0, K, body, i0)

    # search phase analog: S lanes x (1 + 2*nsteps) dependent gathers;
    # walk analog: rmax lanes x (srate + 1).  Lane width capped at 256K
    # (the achievable-GB/s bound is shape-insensitive past full
    # occupancy, and the 1M-lane chain program took >20 min to compile
    # through the remote relay); steps scale up to keep bytes honest.
    CW = min(2 * S, 262144)
    scale = (2 * S) // CW
    i0s = jnp.asarray(rng.integers(0, nblk, CW).astype(np.int32))
    i0w = jnp.asarray(rng.integers(0, nblk, min(rmax, CW)).astype(np.int32))
    ks = 1 + 2 * nsteps  # per-lane rows in search (2 wide x nsteps + ftab)
    kw = fm.srate + 1
    k_search = ((ks + 1) // 2) * scale
    k_walk = kw * max(1, rmax // min(rmax, CW))

    f = jax.jit(lambda a, b: (jnp.sum(chain(a, k_search, CW)),
                              jnp.sum(chain(b, k_walk, min(rmax, CW)))))
    np.asarray(f(i0s, i0w))
    dts = []
    for _ in range(args.iters):
        t0 = time.time()
        np.asarray(f(i0s, i0w))
        dts.append(time.time() - t0)
    t_chain = min(dts)
    chain_bytes = (CW * k_search + min(rmax, CW) * k_walk) * BLK
    gbs_chain = chain_bytes / t_chain / 1e9
    print(f"## dependent-chain bound: {t_chain*1e3:.1f} ms for "
          f"{chain_bytes/1e9:.2f} GB -> {gbs_chain:.1f} GB/s", flush=True)

    # ---- 4. independent flat gather of the same bytes ----
    nrows_flat = chain_bytes // BLK
    i_flat = jnp.asarray(
        rng.integers(0, nblk, min(nrows_flat, 1 << 22)).astype(np.int32))
    reps = max(1, nrows_flat // i_flat.shape[0])

    def flat(i):
        def body(t, acc):  # vary rows per iter: not loop-invariant
            rows = blocks[(i + t) % nblk]
            return acc + jnp.sum(rows.astype(jnp.uint32))

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    g = jax.jit(flat)
    np.asarray(g(i_flat))
    dts = []
    for _ in range(args.iters):
        t0 = time.time()
        np.asarray(g(i_flat))
        dts.append(time.time() - t0)
    t_flat = min(dts)
    flat_bytes = reps * i_flat.shape[0] * BLK
    gbs_flat = flat_bytes / t_flat / 1e9
    print(f"## independent-gather: {t_flat*1e3:.1f} ms for "
          f"{flat_bytes/1e9:.2f} GB -> {gbs_flat:.1f} GB/s", flush=True)

    print(f"## RATIOS: mega/chain-bound = {gbs_mega/gbs_chain:.2f}; "
          f"chain/independent = {gbs_chain/gbs_flat:.2f}; "
          f"independent/HBM-peak(819) = {gbs_flat/819:.2f}", flush=True)


if __name__ == "__main__":
    main()
