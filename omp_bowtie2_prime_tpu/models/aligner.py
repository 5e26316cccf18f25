"""End-to-end unpaired alignment pipeline (the flagship "model").

TPU-native re-design of the reference's batched worker
(multiseedSearchWorker, bt2_search.cpp:2297-2888). The fork already made
alignment phase-synchronous over a resident batch; here each phase is a
fixed-shape device computation over padded batches:

  P1 read/filter      -> host (io/fastq.py)
  P2 instantiate seeds-> host numpy (offsets every interval, fw + rc)
  P4 seed search      -> ops/seed_search.search_seeds   [SEED_BATCH lanes]
  P5 rank hits        -> host (sort ranges by width)
  P6 resolve          -> ops/walk.resolve_rows          [ROW_BATCH lanes]
  P7 extend (DP)      -> ops/sw.sw_e2e_batch            [DP_BATCH problems]
  P8 select/report    -> host (selection, backtrace, MAPQ, SAM)

Budgets/envelopes mirror the reference (bt2_search.cpp:403-433,
aligner_result.h:42-43): seed rounds collapse to one exhaustive pass here
because all seeds are searched at once on device.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..index.format import DeviceIndex, FMIndex
from ..ops import seed_search, sw, walk
from ..utils import dna
from ..utils.mapq import mapq_v2_e2e
from ..utils.scoring import Scoring, SimpleFunc, SIMPLE_FUNC_SQRT
from ..utils import cigar as cigar_util


@dataclasses.dataclass(frozen=True)
class AlignOpts:
    seed_len: int = 22  # multiseedLen (aligner_seed_policy.h:27)
    # -i S,1,1.15 (sensitive default, presets.cpp)
    ival: SimpleFunc = dataclasses.field(
        default_factory=lambda: SimpleFunc(SIMPLE_FUNC_SQRT, 1.0, 1.15)
    )
    range_cap: int = 16  # SA elements resolved per seed range
    max_elts_per_read: int = 400  # maxIters (bt2_search.cpp:411)
    max_dp_per_read: int = 300  # maxDp (bt2_search.cpp:413)
    l_max: int = 160  # ALN_MAX_ROWS (aligner_result.h:42)
    c_strict: int = 200  # ALN_MAX_COLS (aligner_result.h:43): DP bail width
    minsc_clamp: int = -254  # u8-only build clamp (bt2_search.cpp:2487-2491)
    seed_batch: int = 2048
    row_batch: int = 4096
    dp_batch: int = 256
    dp_cols: int = 200  # device window capacity (cols)


@dataclasses.dataclass
class AlnResult:
    """Per-read outcome."""

    status: str  # "aligned" | "unaligned"
    fw: bool = True
    refid: int = -1
    refoff: int = -1  # 0-based
    score: int = 0
    secbest: object = None
    mapq: int = 0
    cigar: list = dataclasses.field(default_factory=list)
    stats: dict = dataclasses.field(default_factory=dict)
    nhits: int = 0
    span: int = 0  # reference chars consumed


@dataclasses.dataclass
class Candidate:
    """A scored DP endpoint for one read: a distinct (fw, joined end col)
    (the dedupe key the reference applies per DP problem via its redundancy
    checks, aligner_sw_driver.cpp:528-560). Backtrace details are filled
    lazily by TPUAligner.backtrace()."""

    score: int
    fw: bool
    endj: int  # joined-text column where the alignment ends (exclusive)
    problem: dict  # read/pens/wstart/wlen for the DP window
    bc: int  # best end column within the window
    # lazily-populated backtrace results:
    resolved: bool = False
    valid: bool = False  # False if straddles a fragment boundary
    joined_start: int = -1
    span: int = 0
    refid: int = -1
    refoff: int = -1
    cigar: list = dataclasses.field(default_factory=list)
    stats: dict = dataclasses.field(default_factory=dict)


class TPUAligner:
    def __init__(self, fm: FMIndex, scoring: Scoring | None = None, opts: AlignOpts | None = None):
        from ..utils.jaxcfg import enable_compile_cache

        enable_compile_cache()
        self.fm = fm
        self.sc = scoring or Scoring()
        self.opts = opts or AlignOpts()
        self.idx = DeviceIndex.from_host(fm)
        self.text = dna.unpack_2bit(fm.ref_words, fm.n)
        self.mm_tab = self.sc.mm_table()
        self.swp = sw.SWParams.from_scoring(self.sc)
        o = self.opts
        self._search_fn = jax.jit(seed_search.search_seeds)
        self._resolve_fn = jax.jit(walk.resolve_rows)
        self._sw_fn = jax.jit(sw.sw_e2e_batch, static_argnums=5)

    # ---------------- P2: seed instantiation ----------------

    NROUNDS = 2  # nSeedRounds (bt2_search.cpp:433)

    def _instantiate_seeds(self, reads, indices=None, roundi: int = 0):
        """Returns (seeds [S, seed_len] int8, meta list of (read_i, fw, off)).

        Offsets every interval from the 5' end of each orientation; round
        r>0 shifts the start by interval*r/nrounds (ref: prepareOneSeed
        call sites, bt2_search.cpp:2538-2584; instantiateSeeds,
        aligner_seed.cpp:397-447)."""
        sl = self.opts.seed_len
        if indices is None:
            indices = range(len(reads))
        seeds, meta = [], []
        for ri in indices:
            rd = reads[ri]
            ln = len(rd.seq)
            if ln < sl:
                continue
            ival = max(1, int(self.opts.ival.f(float(ln))))
            nrounds = min(self.NROUNDS, ival)
            if roundi >= nrounds:
                continue
            start = (ival * roundi) // nrounds
            if start > 0 and sl + start > ln:
                continue
            rc = dna.revcomp(rd.seq)
            for depth in range(start, ln - sl + 1, ival):
                seeds.append(rd.seq[depth : depth + sl])
                meta.append((ri, True, depth))
                # rc seeds are extracted mirrored: offset in the rc read is
                # rdlen - depth - seed_len (ref: instantiateSeq,
                # aligner_seed.cpp:301-313)
                rc_off = ln - depth - sl
                seeds.append(rc[rc_off : rc_off + sl])
                meta.append((ri, False, rc_off))
        if not seeds:
            return np.zeros((0, sl), np.int8), []
        return np.stack(seeds).astype(np.int8), meta

    # ---------------- device phase helpers (padded chunking) ----------------

    def _search(self, seeds: np.ndarray):
        o = self.opts
        S = len(seeds)
        tops = np.zeros(S, np.int32)
        bots = np.zeros(S, np.int32)
        for lo in range(0, S, o.seed_batch):
            hi = min(lo + o.seed_batch, S)
            chunk = np.zeros((o.seed_batch, seeds.shape[1]), np.int32)
            chunk[: hi - lo] = seeds[lo:hi]
            valid = np.zeros(o.seed_batch, bool)
            valid[: hi - lo] = True
            t, b = self._search_fn(self.idx, jnp.asarray(chunk), jnp.asarray(valid))
            tops[lo:hi] = np.asarray(t)[: hi - lo]
            bots[lo:hi] = np.asarray(b)[: hi - lo]
        return tops, bots

    def _resolve(self, rows: np.ndarray):
        o = self.opts
        R = len(rows)
        offs = np.full(R, -1, np.int32)
        for lo in range(0, R, o.row_batch):
            hi = min(lo + o.row_batch, R)
            chunk = np.zeros(o.row_batch, np.int32)
            chunk[: hi - lo] = rows[lo:hi]
            valid = np.zeros(o.row_batch, bool)
            valid[: hi - lo] = True
            r = self._resolve_fn(self.idx, jnp.asarray(chunk), jnp.asarray(valid))
            offs[lo:hi] = np.asarray(r)[: hi - lo]
        return offs

    def _run_dp(self, problems, cols: int | None = None):
        """problems: list of dicts with read(oriented codes), pens, window
        (wstart, wlen). Returns per-problem (best, bestcol). `cols` widens
        the device window (e.g. mate-rescue windows span up to maxins
        reference chars; the seed-extend path uses the reference's 200-col
        envelope)."""
        o = self.opts
        n = len(problems)
        best = np.full(n, sw.NEG, np.int64)
        bestcol = np.zeros(n, np.int32)
        L, C = o.l_max, (cols or o.dp_cols)
        for lo in range(0, n, o.dp_batch):
            hi = min(lo + o.dp_batch, n)
            B = o.dp_batch
            reads = np.full((B, L), 4, np.int32)
            pens = np.zeros((B, L), np.int32)
            rdlens = np.zeros(B, np.int32)
            refs = np.full((B, C), 4, np.int32)
            wlens = np.zeros(B, np.int32)
            for k, pr in enumerate(problems[lo:hi]):
                ln = len(pr["read"])
                reads[k, :ln] = pr["read"]
                pens[k, :ln] = pr["pens"]
                rdlens[k] = ln
                ws, wl = pr["wstart"], pr["wlen"]
                refs[k, :wl] = self.text[ws : ws + wl]
                wlens[k] = wl
            b, bc, _ = self._sw_fn(
                jnp.asarray(reads),
                jnp.asarray(pens),
                jnp.asarray(rdlens),
                jnp.asarray(refs),
                jnp.asarray(wlens),
                self.swp,
            )
            best[lo:hi] = np.asarray(b)[: hi - lo]
            bestcol[lo:hi] = np.asarray(bc)[: hi - lo]
        return best, bestcol

    # ---------------- main entry ----------------

    def align_batch(self, reads) -> list[AlnResult]:
        """Multi-round alignment: round 0 seeds at offset 0, round 1 (for
        reads still unaligned) at offset interval/2 — the fork's resident
        batch keeps reads for nSeedRounds=2 rounds (bt2_search.cpp:2436,
        2572-2584)."""
        n = len(reads)
        results = [AlnResult(status="unaligned") for _ in range(n)]
        # per-read scoring context (minsc clamps: bt2_search.cpp:2476-2491)
        minscs = self.min_scores(reads)

        active = list(range(n))
        for roundi in range(self.NROUNDS):
            if not active:
                break
            cands = self.collect_candidates(reads, minscs, active, roundi)
            self._finalize_unpaired(reads, minscs, cands, results)
            active = [ri for ri in active if results[ri].status != "aligned"]
        return results

    def min_scores(self, reads) -> np.ndarray:
        """Per-read clamped minimum scores (bt2_search.cpp:2476-2491)."""
        o, sc = self.opts, self.sc
        minscs = np.zeros(len(reads), np.int64)
        for ri, rd in enumerate(reads):
            m = sc.min_score(len(rd.seq))
            if m > 0:
                m = 0
            if m < o.minsc_clamp:
                m = o.minsc_clamp
            minscs[ri] = m
        return minscs

    def collect_candidates(self, reads, minscs, active, roundi):
        """Phases P2-P7 for one seeding round: returns per-read dicts
        {(fw, endj): Candidate} for every valid-scoring DP endpoint."""
        o, sc = self.opts, self.sc
        n = len(reads)

        empty = [{} for _ in range(n)]

        # P2 + P4: seeds and search
        seeds, meta = self._instantiate_seeds(reads, active, roundi)
        if len(meta) == 0:
            return empty
        tops, bots = self._search(seeds)

        # P5: rank — per read, ranges sorted by width ascending
        # (ref: rankSeedHits, aligner_seed.h:1000-1062)
        per_read_ranges = [[] for _ in range(n)]
        for si, (ri, fw, off) in enumerate(meta):
            w = int(bots[si] - tops[si])
            if w > 0:
                per_read_ranges[ri].append((w, int(tops[si]), int(bots[si]), fw, off))
        rows, row_meta = [], []
        for ri, ranges in enumerate(per_read_ranges):
            ranges.sort(key=lambda r: (r[0], not r[3], r[4]))
            budget = o.max_elts_per_read
            for w, top, bot, fw, off in ranges:
                take = min(w, o.range_cap, budget)
                for r in range(top, top + take):
                    rows.append(r)
                    row_meta.append((ri, fw, off))
                budget -= take
                if budget <= 0:
                    break
        if not rows:
            return empty

        # P6: resolve SA rows -> joined offsets
        offs = self._resolve(np.array(rows, np.int32))

        # candidates: dedupe by (read, fw, diagonal)
        cand_seen = set()
        problems = []
        prob_meta = []
        dp_count = np.zeros(n, np.int32)
        maxgaps_cache = {}
        for (ri, fw, soff), joff in zip(row_meta, offs):
            if joff < 0:
                continue
            rd = reads[ri]
            ln = len(rd.seq)
            cand = int(joff) - soff
            key = (ri, fw, cand)
            if key in cand_seen:
                continue
            cand_seen.add(key)
            if dp_count[ri] >= o.max_dp_per_read:
                continue
            if ln > o.l_max:
                continue  # reference DP-row envelope: read too long for DP
            mg_key = (ln, int(minscs[ri]))
            if mg_key not in maxgaps_cache:
                maxgaps_cache[mg_key] = sc.max_read_gaps(int(minscs[ri]), ln)
            maxgaps = maxgaps_cache[mg_key]
            width = ln + 2 * maxgaps
            if width > o.c_strict:
                continue  # reference col envelope (aligner_sw.cpp:138-142)
            wstart = cand - maxgaps
            wend = cand + ln + maxgaps
            wstart_cl = max(0, wstart)
            wend_cl = min(self.fm.n, wend)
            wlen = wend_cl - wstart_cl
            if wlen <= 0:
                continue
            oriented = rd.seq if fw else dna.revcomp(rd.seq)
            q = rd.qual if fw else rd.qual[::-1]
            pens = self.mm_tab[np.minimum(q, 255)]
            dp_count[ri] += 1
            problems.append(
                dict(read=oriented, pens=pens, wstart=wstart_cl, wlen=wlen)
            )
            prob_meta.append((ri, fw))

        if not problems:
            return empty

        # P7: batched DP
        best, bestcol = self._run_dp(problems)

        # collect valid-scoring candidates, deduped by (fw, end column)
        cands = [{} for _ in range(n)]
        for pi, ((ri, fw), b, bc) in enumerate(zip(prob_meta, best, bestcol)):
            if b < minscs[ri]:
                continue
            endj = problems[pi]["wstart"] + int(bc)
            key = (fw, endj)
            cur = cands[ri].get(key)
            if cur is None or b > cur.score:
                cands[ri][key] = Candidate(
                    score=int(b), fw=fw, endj=endj, problem=problems[pi], bc=int(bc)
                )
        return cands

    def backtrace(self, cand: Candidate) -> Candidate:
        """Host backtrace of one candidate (ref analog:
        backtraceNucleotidesEnd2EndSseU8, aligner_swsse_ee_u8.cpp:746-1350);
        fills coordinates/cigar/stats, caches on the candidate."""
        if cand.resolved:
            return cand
        cand.resolved = True
        pr = cand.problem
        refw = self.text[pr["wstart"] : pr["wstart"] + pr["wlen"]]
        H, E, F = sw.sw_e2e_full_numpy(pr["read"], pr["pens"], refw, self.swp)
        aln = sw.backtrace_numpy(
            pr["read"], pr["pens"], refw, self.swp, H, E, F, cand.bc
        )
        cand.joined_start = pr["wstart"] + aln.start_col
        cand.span = aln.end_col - aln.start_col
        mapped = self.fm.refmap.joined_to_ref(cand.joined_start, cand.span)
        if mapped is None:
            return cand  # straddles fragment boundary (bt2_idx.cpp:54-128)
        cand.refid, cand.refoff = mapped
        cand.cigar = aln.cigar
        cand.stats = cigar_util.alignment_stats(
            pr["read"], refw, aln.start_col, aln.cigar
        )
        cand.valid = True
        return cand

    @staticmethod
    def rank_candidates(alns: dict) -> list:
        """Deterministic candidate order: score desc, fw first, end col asc
        (the analog of selectByScore's sort, aln_sink.cpp:1477-1628, with a
        deterministic rather than read-seeded-RNG tiebreak)."""
        return sorted(
            alns.items(), key=lambda kv: (-kv[1].score, not kv[0][0], kv[0][1])
        )

    def _finalize_unpaired(self, reads, minscs, cands, results) -> None:
        sc = self.sc
        for ri, alns in enumerate(cands):
            if not alns:
                continue
            rd = reads[ri]
            ln = len(rd.seq)
            ranked = self.rank_candidates(alns)
            secbest = ranked[1][1].score if len(ranked) > 1 else None
            for (fw, endj), cand in ranked:
                self.backtrace(cand)
                if not cand.valid:
                    continue
                perfect = sc.match_bonus * ln
                mq = mapq_v2_e2e(cand.score, secbest, int(minscs[ri]), perfect)
                results[ri] = AlnResult(
                    status="aligned",
                    fw=fw,
                    refid=cand.refid,
                    refoff=cand.refoff,
                    score=cand.score,
                    secbest=secbest,
                    mapq=mq,
                    cigar=cand.cigar,
                    stats=cand.stats,
                    nhits=1,
                    span=cand.span,
                )
                break
