"""Command-line interface: build / align / inspect.

Mirrors the reference tool surface (bowtie2-build, bowtie2, bowtie2-inspect;
ref: bt2_build.cpp, bt2_search.cpp:685-885 usage, bt2_inspect.cpp) on the
TPU-native engine. Index files use the .npz container from index/format.py.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def cmd_build(args):
    from .index.builder import build_index

    t0 = time.time()
    fm = build_index(args.fasta, ftab_k=args.ftab_chars, srate=args.sa_rate)
    fm.save(args.out)
    print(
        f"built index: {fm.n} bases, {fm.nrows} rows, "
        f"{len(fm.refmap.refnames)} refs in {time.time()-t0:.1f}s",
        file=sys.stderr,
    )


def cmd_align(args):
    from .index.format import FMIndex
    from .io.fastq import (
        open_reads, open_paired_reads, read_interleaved, read_tab5,
        read_tab6, batch_iterator,
    )
    from .io.sam import SamWriter
    from .models.aligner import TPUAligner, AlignOpts
    from .models.paired import PairedAligner
    from .utils.pe import PEPolicy, policy_from_flags
    from .utils.scoring import Scoring, SimpleFunc

    fm = FMIndex.load(args.index if args.index.endswith(".npz") else args.index + ".npz")
    sc = Scoring()
    if args.score_min:
        sc = Scoring(score_min=SimpleFunc.parse(args.score_min))
    opts = AlignOpts(seed_len=args.seed_len)
    aligner = TPUAligner(fm, sc, opts)

    paired_src = None
    if args.m1 and args.m2:
        paired_src = open_paired_reads(args.m1, args.m2)
    elif args.interleaved:
        paired_src = read_interleaved(args.interleaved)
    elif args.tab6:
        paired_src = read_tab6(args.tab6)
    elif args.tab5:
        paired_src = read_tab5(args.tab5)
    elif not args.reads:
        print("error: no input reads (-U, -1/-2, --interleaved, --tab5/6)",
              file=sys.stderr)
        sys.exit(1)

    out = open(args.sam, "w") if args.sam != "-" else sys.stdout
    cl = " ".join(sys.argv)
    w = SamWriter(out, fm.refmap.refnames, fm.refmap.reflens, prog_args=cl)
    w.write_header()
    t0 = time.time()
    nreads = 0
    if paired_src is not None:
        m1fw, m2fw = {"fr": (True, False), "rf": (False, True),
                      "ff": (True, True)}[args.orient]
        pe = PEPolicy(
            pol=policy_from_flags(m1fw, m2fw),
            minfrag=args.minins,
            maxfrag=args.maxins,
            dovetail_ok=args.dovetail,
            contain_ok=not args.no_contain,
            olap_ok=not args.no_overlap,
        )
        pal = PairedAligner(aligner, pe, mixed=not args.no_mixed,
                            discord=not args.no_discordant)
        for batch in batch_iterator(paired_src, args.batch):
            results = pal.align_pairs(batch)
            for (rd1, rd2), pres in zip(batch, results):
                nreads += 2
                w.write_pair(rd1, rd2, pres.m1, pres.m2, pres.cat,
                             pres.tlen1, pres.tlen2)
    else:
        for batch in batch_iterator(open_reads(args.reads), args.batch):
            results = aligner.align_batch(batch)
            for rd, res in zip(batch, results):
                nreads += 1
                if res.status == "aligned":
                    from .utils.cigar import cigar_string

                    w.write_aligned(
                        rd,
                        res.fw,
                        fm.refmap.refnames[res.refid],
                        res.refoff,
                        res.mapq,
                        cigar_string(res.cigar),
                        res.score,
                        res.secbest,
                        res.stats,
                    )
                else:
                    w.write_unaligned(rd)
    dt = time.time() - t0
    print(w.summary.render(), file=sys.stderr)
    print(f"# {nreads} reads in {dt:.2f}s = {nreads/max(dt,1e-9):.1f} reads/s", file=sys.stderr)
    if out is not sys.stdout:
        out.close()


def cmd_inspect(args):
    from .index.format import FMIndex
    from .utils import dna

    fm = FMIndex.load(args.index if args.index.endswith(".npz") else args.index + ".npz")
    if args.summary:
        print(f"Flags\t0")
        print(f"SA-Sample\t1 in {fm.srate}")
        print(f"FtabChars\t{fm.ftab_k}")
        for name, ln in zip(fm.refmap.refnames, fm.refmap.reflens):
            print(f"Sequence\t{name}\t{ln}")
    else:
        # reconstruct reference sequences from the stored 2-bit text + map
        rm = fm.refmap
        text = dna.unpack_2bit(fm.ref_words, fm.n)
        for rid, name in enumerate(rm.refnames):
            seq = np.full(rm.reflens[rid], 4, np.int8)
            for fi in range(len(rm.frag_joined)):
                if rm.frag_refid[fi] != rid:
                    continue
                s, r, l = rm.frag_joined[fi], rm.frag_ref[fi], rm.frag_len[fi]
                seq[r : r + l] = text[s : s + l]
            print(f">{name}")
            s = dna.decode(seq)
            for i in range(0, len(s), 60):
                print(s[i : i + 60])


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bt2tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build FM index from FASTA")
    b.add_argument("fasta", nargs="+")
    b.add_argument("out")
    b.add_argument("--ftab-chars", type=int, default=10)
    b.add_argument("--sa-rate", type=int, default=16)
    b.set_defaults(fn=cmd_build)

    a = sub.add_parser("align", help="align reads, emit SAM")
    a.add_argument("-x", "--index", required=True)
    a.add_argument("-U", "--reads", default=None)
    a.add_argument("-1", "--m1", dest="m1", default=None)
    a.add_argument("-2", "--m2", dest="m2", default=None)
    a.add_argument("--interleaved", default=None)
    a.add_argument("--tab5", default=None)
    a.add_argument("--tab6", default=None)
    a.add_argument("-S", "--sam", default="-")
    a.add_argument("--batch", type=int, default=512)
    a.add_argument("--seed-len", type=int, default=22)
    a.add_argument("--score-min", default=None)
    # paired-end policy (ref defaults bt2_search.cpp:303-313)
    a.add_argument("-I", "--minins", type=int, default=0)
    a.add_argument("-X", "--maxins", type=int, default=500)
    a.add_argument("--fr", dest="orient", action="store_const", const="fr", default="fr")
    a.add_argument("--rf", dest="orient", action="store_const", const="rf")
    a.add_argument("--ff", dest="orient", action="store_const", const="ff")
    a.add_argument("--no-mixed", action="store_true")
    a.add_argument("--no-discordant", action="store_true")
    a.add_argument("--dovetail", action="store_true")
    a.add_argument("--no-contain", action="store_true")
    a.add_argument("--no-overlap", action="store_true")
    a.set_defaults(fn=cmd_align)

    i = sub.add_parser("inspect", help="inspect index")
    i.add_argument("index")
    i.add_argument("-s", "--summary", action="store_true")
    i.set_defaults(fn=cmd_inspect)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
