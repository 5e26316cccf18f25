"""CLI surface tests: presets, reporting modes (-k/-a), read transforms,
paired options — the pytest analog of the reference's option-driven
simple_tests.pl cases (scripts/test/)."""

import io
import os

import numpy as np
import pytest

from omp_bowtie2_prime_tpu import cli
from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts
from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.presets import PRESETS


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(41)
    text = rng.integers(0, 4, 12000).astype(np.int8)
    fa = d / "g.fa"
    s = dna.decode(text)
    fa.write_text(">chrC\n" + "\n".join(s[i:i+70] for i in range(0, len(s), 70)) + "\n")
    joined, refmap = join_references(["chrC"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    idx = d / "g.npz"
    fm.save(str(idx))
    return d, text, str(idx)


def make_fastq(path, reads):
    with open(path, "w") as f:
        for name, seq, qual in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def run_cli(args):
    cli.main(args)


def test_presets_table():
    assert PRESETS["very-fast"].nrounds == 1
    assert PRESETS["very-sensitive"].seed_len == 20
    assert PRESETS["sensitive"].ival.f(100.0) == pytest.approx(1 + 1.15 * 10.0)


def test_cli_end_to_end(genome, tmp_path, capsys):
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    s = dna.decode(text[2000:2100])
    make_fastq(str(fq), [("q0", s, "I" * 100)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--very-sensitive"])
    recs = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(recs) == 1
    f = recs[0].split("\t")
    assert f[0] == "q0" and int(f[3]) == 2001 and f[5] == "100M"


def test_cli_k_mode_secondary(genome, tmp_path):
    d, text, idx = genome
    # read matching a duplicated segment -> 2 alignments with -k 2
    seg = text[3000:3100]
    dup_text = np.concatenate([text, seg, text[:50]])
    joined, refmap = join_references(["chrD"], [dup_text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    idx2 = tmp_path / "d.npz"
    fm.save(str(idx2))
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [("q0", dna.decode(seg), "I" * 100)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", str(idx2), "-U", str(fq), "-S", str(out), "-k", "2"])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 2
    flags = sorted(int(r[1]) & 0x100 for r in recs)
    assert flags == [0, 0x100]
    assert all(int(r[4]) == 255 for r in recs)  # -k>1: MAPQ not meaningful
    poss = sorted(int(r[3]) for r in recs)
    assert poss == [3001, 12001]


def test_cli_trim_and_skip(genome, tmp_path):
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    s0 = dna.decode(text[100:200])
    s1 = "AC" + dna.decode(text[4000:4100]) + "GT"  # needs -5 2 -3 2
    make_fastq(str(fq), [("skipme", s0, "I" * 100), ("q1", s1, "I" * 104)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "-s", "1", "-5", "2", "-3", "2"])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 1
    assert recs[0][0] == "q1" and int(recs[0][3]) == 4001
    assert recs[0][5] == "100M"


def test_cli_no_unal_and_un_file(genome, tmp_path):
    d, text, idx = genome
    rng = np.random.default_rng(42)
    fq = tmp_path / "r.fq"
    junk = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    make_fastq(str(fq), [("junk", junk, "I" * 100)])
    out = tmp_path / "o.sam"
    un = tmp_path / "un.fq"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--no-unal", "--un", str(un)])
    recs = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert recs == []
    assert "@junk" in un.read_text()


def test_cli_norc(genome, tmp_path):
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    rc = dna.decode(dna.revcomp(text[5000:5100]))
    make_fastq(str(fq), [("r0", rc, "I" * 100)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out), "--norc"])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert int(recs[0][1]) & 0x4  # rc-only read can't align with --norc


def test_cli_rg_and_headers(genome, tmp_path):
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [("q0", dna.decode(text[600:700]), "I" * 100)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--rg-id", "grp1", "--rg", "SM:sampleA"])
    txt = out.read_text()
    assert "@RG\tID:grp1\tSM:sampleA" in txt
    assert "RG:Z:grp1" in txt


def test_cli_paired(genome, tmp_path):
    d, text, idx = genome
    fq1, fq2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    pos = 7000
    s1 = dna.decode(text[pos : pos + 100])
    s2 = dna.decode(dna.revcomp(text[pos + 200 : pos + 300]))
    make_fastq(str(fq1), [("p0/1", s1, "I" * 100)])
    make_fastq(str(fq2), [("p0/2", s2, "I" * 100)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-1", str(fq1), "-2", str(fq2),
             "-S", str(out)])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 2
    assert recs[0][0] == "p0" and recs[1][0] == "p0"
    assert int(recs[0][1]) & 0x2 and int(recs[1][1]) & 0x2
    assert int(recs[0][8]) == 300 and int(recs[1][8]) == -300


def test_cli_local_accepted(genome, tmp_path, capsys):
    """--local no longer warns: local mode is implemented (the fork prints
    "not supported", bt2_search.cpp:1345-1348 — a capability we restore)."""
    d, text, idx = genome
    out = tmp_path / "l.sam"
    run_cli(["align", "-x", idx, "-U", "/dev/null", "--local",
             "-S", str(out)])
    assert "not supported" not in capsys.readouterr().err
    assert out.exists()


def test_bam_input(genome, tmp_path):
    """BAM round-trip: write a minimal BGZF-free gzip BAM, align from it."""
    import gzip
    import struct

    d, text, idx = genome
    from omp_bowtie2_prime_tpu.utils import dna as _dna

    seq = _dna.decode(text[900:1000])
    # minimal BAM: header, one ref, one unaligned record
    name = b"bq0"
    l_seq = len(seq)
    code = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}
    packed = bytearray()
    for i in range(0, l_seq, 2):
        hi = code[seq[i]] << 4
        lo = code[seq[i + 1]] if i + 1 < l_seq else 0
        packed.append(hi | lo)
    rec = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0, 4,
                      l_seq, -1, -1, 0)
    rec += name + b"\x00" + bytes(packed) + bytes([30] * l_seq)
    body = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 0)
    body += struct.pack("<i", len(rec)) + rec
    p = tmp_path / "in.bam"
    with gzip.open(p, "wb") as f:
        f.write(body)
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-b", str(p), "-S", str(out)])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 1
    assert recs[0][0] == "bq0" and int(recs[0][3]) == 901


def test_zstd_inputs(tmp_path):
    """zstd-compressed FASTQ and FASTA inputs (reference: WITH_ZSTD,
    zstd_decompress.h/.cpp) parse identically to plain files."""
    import zstandard

    from omp_bowtie2_prime_tpu.index.fasta import parse_fasta
    from omp_bowtie2_prime_tpu.io.fastq import read_fastq

    fq = b"@r0\nACGTACGT\n+\nIIIIIIII\n@r1\nTTTTCCCC\n+\nIIIIIIII\n"
    fa = b">c1 desc\nACGTACGTAAAA\nCCCC\n"
    zf = tmp_path / "reads.fq.zst"
    zf.write_bytes(zstandard.ZstdCompressor().compress(fq))
    za = tmp_path / "ref.fa.zst"
    za.write_bytes(zstandard.ZstdCompressor().compress(fa))
    pf = tmp_path / "reads.fq"
    pf.write_bytes(fq)

    plain = list(read_fastq(str(pf)))
    z = list(read_fastq(str(zf)))
    assert len(z) == len(plain) == 2
    for a, b in zip(z, plain):
        assert a.name == b.name and (a.seq == b.seq).all() \
            and (a.qual == b.qual).all()

    names, seqs = parse_fasta(str(za))
    assert names[0].startswith("c1") and len(seqs[0]) == 16


def test_fasta_continuous_windows(tmp_path):
    """-F k:N,i:N window sampling (FastaContinuousPatternSource,
    pat.cpp:901-976): offset-suffixed names, freq stepping, N mapping."""
    from omp_bowtie2_prime_tpu.io.fastq import read_fasta_continuous

    fa = tmp_path / "g.fa"
    fa.write_text(">s1 desc here\nACGTACGTAC\nGTNNACGT\n>s2\nAAACCC\n")
    reads = list(read_fasta_continuous(str(fa), 6, 4))
    # s1 cleaned length 18 -> starts 0,4,8,12; s2 length 6 -> start 0
    assert [r.name for r in reads] == [
        "s1_0", "s1_4", "s1_8", "s1_12", "s2_0"
    ]
    from omp_bowtie2_prime_tpu.utils import dna
    assert dna.decode(reads[0].seq) == "ACGTAC"
    assert dna.decode(reads[2].seq) == "ACGTNN"  # IUPAC N kept as N
    assert (reads[0].qual == 40).all()
    # shorter-than-k sequence yields nothing
    fa2 = tmp_path / "h.fa"
    fa2.write_text(">tiny\nACG\n")
    assert list(read_fasta_continuous(str(fa2), 6, 1)) == []


def test_solexa_qual_conversion():
    """--solexa-quals conversion matches the reference solToPhred table
    (qual.cpp:57-75) for the -10..10 range and identity above."""
    import numpy as np
    table = {-10: 0, -9: 1, -8: 1, -7: 1, -6: 1, -5: 1, -4: 1, -3: 2,
             -2: 2, -1: 3, 0: 3, 1: 4, 2: 4, 3: 5, 4: 5, 5: 6, 6: 7,
             7: 8, 8: 9, 9: 10, 10: 10, 20: 20, 40: 40}
    for sol, want in table.items():
        got = int(np.round(10.0 * np.log10(1.0 + 10.0 ** (sol / 10.0))))
        assert got == want, (sol, got, want)


def test_cli_local_mode(genome, tmp_path):
    """--local soft-clips a garbage 5' flank (restored local capability;
    the fork prints "not supported", bt2_search.cpp:1345-1348), and the
    -local preset names imply --local."""
    d, text, idx = genome
    fq = tmp_path / "loc.fq"
    core = dna.decode(text[4000:4090])
    garb = dna.decode((text[3988:4000] + 2) % 4)  # mismatches everywhere
    make_fastq(str(fq), [("lq0", garb + core, "I" * 102)])
    out = tmp_path / "loc.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out), "--local"])
    rec = [l for l in out.read_text().splitlines() if not l.startswith("@")][0]
    f = rec.split("\t")
    assert f[5] == "12S90M"
    assert int(f[3]) == 4001  # SAM 1-based
    assert "AS:i:180" in rec  # 90 matches x ma=2

    out2 = tmp_path / "loc2.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out2),
             "--very-sensitive-local"])
    rec2 = [l for l in out2.read_text().splitlines()
            if not l.startswith("@")][0]
    assert rec2.split("\t")[5] == "12S90M"


def test_qc_filter_qseq(genome, tmp_path):
    """--qc-filter drops qseq reads whose filter field is 0 with YF:Z:QC
    (qcfilt bt2_search.cpp:2517-2520, printYF aligner_result.cpp:987-992);
    without the flag the field is ignored ("don't believe upstream qc",
    bt2_search.cpp:369)."""
    d, text, idx = genome
    s_ok = dna.decode(text[3000:3100])
    s_bad = dna.decode(text[5000:5100])
    qf = tmp_path / "r.qseq"
    q = "I" * 100
    qf.write_text(
        f"M\t1\t1\t1\t0\t0\t0\t1\t{s_ok}\t{q}\t1\n"
        f"M\t1\t1\t1\t0\t1\t0\t1\t{s_bad}\t{q}\t0\n"
    )
    out = tmp_path / "qc.sam"
    run_cli(["align", "-x", idx, "--qseq", "-U", str(qf), "-S", str(out),
             "--qc-filter"])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 2
    assert recs[0][2] != "*"           # passing read aligns
    assert recs[1][1] == "4"           # filtered read unaligned
    assert "YF:Z:QC" in recs[1]

    out2 = tmp_path / "noqc.sam"
    run_cli(["align", "-x", idx, "--qseq", "-U", str(qf), "-S", str(out2)])
    recs2 = [l.split("\t") for l in out2.read_text().splitlines()
             if not l.startswith("@")]
    assert recs2[1][2] != "*"          # field ignored without the flag


def test_cli_trim_to(genome, tmp_path):
    """--trim-to [5:|3:]N trims the specified end down to N bases
    (ARG_TRIM_TO, bt2_search.cpp parseOption; default side is 3')."""
    d, text, idx = genome
    core = dna.decode(text[6000:6100])
    fq = tmp_path / "r.fq"
    # 20 junk bases on the 5' side: --trim-to 5:100 must remove them
    make_fastq(str(fq), [("q0", "A" * 20 + core, "I" * 120)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--trim-to", "5:100"])
    rec = [l.split("\t") for l in out.read_text().splitlines()
           if not l.startswith("@")][0]
    assert int(rec[3]) == 6001 and rec[5] == "100M"

    # junk on the 3' side: plain --trim-to N defaults to the 3' end
    fq2 = tmp_path / "r2.fq"
    make_fastq(str(fq2), [("q1", core + "A" * 20, "I" * 120)])
    out2 = tmp_path / "o2.sam"
    run_cli(["align", "-x", idx, "-U", str(fq2), "-S", str(out2),
             "--trim-to", "100"])
    rec2 = [l.split("\t") for l in out2.read_text().splitlines()
            if not l.startswith("@")][0]
    assert int(rec2[3]) == 6001 and rec2[5] == "100M"


def test_cli_int_quals(genome, tmp_path):
    """--int-quals: FASTQ qual line is space-separated phred integers
    (qual.h int parsing). Mismatch penalty is qual-scaled (MX=6, MN=2),
    so one mismatch costs 6 at q40 but 2 at q0."""
    d, text, idx = genome
    seq = text[7000:7100].copy()
    seq[50] = (seq[50] + 1) % 4  # one mismatch mid-read
    s = dna.decode(seq)
    for quals, as_exp in (("40", -6), ("0", -2)):
        fq = tmp_path / f"iq{quals}.fq"
        fq.write_text(f"@q0\n{s}\n+\n{' '.join([quals] * 100)}\n")
        out = tmp_path / f"iq{quals}.sam"
        run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
                 "--int-quals"])
        rec = [l.split("\t") for l in out.read_text().splitlines()
               if not l.startswith("@")][0]
        assert int(rec[3]) == 7001 and rec[5] == "100M"
        assert f"AS:i:{as_exp}" in rec, (quals, rec)


def test_cli_phred64(genome, tmp_path):
    """--phred64: qual chars are phred+64. 'h' (104) = q40 either way
    the flag decides: under phred64 it means 40, under phred33 it would
    be 71 (clamped scaling still yields MX)."""
    d, text, idx = genome
    seq = text[8000:8100].copy()
    seq[10] = (seq[10] + 1) % 4
    s = dna.decode(seq)
    fq = tmp_path / "p64.fq"
    # '@' = 64 -> q0 under phred64; mismatch at a q0 base costs MN=2
    quals = "h" * 10 + "@" + "h" * 89
    make_fastq(str(fq), [("q0", s, quals)])
    out = tmp_path / "p64.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--phred64"])
    rec = [l.split("\t") for l in out.read_text().splitlines()
           if not l.startswith("@")][0]
    assert int(rec[3]) == 8001 and rec[5] == "100M"
    assert "AS:i:-2" in rec


def test_qname_whitespace_truncation(genome, tmp_path):
    """Parsers keep the FULL name line; SAM output truncates QNAME at the
    first whitespace unless --sam-no-qname-trunc (truncQname,
    sam.h:320-326). The un-file passthrough keeps the full line."""
    d, text, idx = genome
    s = dna.decode(text[9000:9100])
    fq = tmp_path / "r.fq"
    fq.write_text(f"@q0 descriptive words\n{s}\n+\n{'I' * 100}\n")
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out)])
    rec = [l.split("\t") for l in out.read_text().splitlines()
           if not l.startswith("@")][0]
    assert rec[0] == "q0" and int(rec[3]) == 9001

    out2 = tmp_path / "o2.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out2),
             "--sam-no-qname-trunc"])
    rec2 = [l.split("\t") for l in out2.read_text().splitlines()
            if not l.startswith("@")][0]
    assert rec2[0] == "q0 descriptive words"


def test_omit_sec_seq(genome, tmp_path):
    """--omit-sec-seq: secondary (-k 2) records print * SEQ/QUAL."""
    d, text, idx = genome
    seg = text[3000:3100]
    dup_text = np.concatenate([text, seg, text[:50]])
    joined, refmap = join_references(["chrD"], [dup_text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    idx2 = tmp_path / "d.npz"
    fm.save(str(idx2))
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [("q0", dna.decode(seg), "I" * 100)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", str(idx2), "-U", str(fq), "-S", str(out),
             "-k", "2", "--omit-sec-seq"])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    prim = [r for r in recs if not int(r[1]) & 0x100][0]
    sec = [r for r in recs if int(r[1]) & 0x100][0]
    assert prim[9] != "*" and prim[10] != "*"
    assert sec[9] == "*" and sec[10] == "*"


def test_paired_qseq_format(genome, tmp_path):
    """-1/-2 with --qseq routes both mates through the qseq parser
    (ref: paired PatternSources honor the format flag, pat.cpp)."""
    d, text, idx = genome
    s1 = dna.decode(text[2000:2100])
    s2 = dna.decode(dna.revcomp(text[2200:2300]))
    q = "I" * 100
    f1, f2 = tmp_path / "m1.qseq", tmp_path / "m2.qseq"
    f1.write_text(f"M\t1\t1\t1\t0\t0\t0\t1\t{s1}\t{q}\t1\n")
    f2.write_text(f"M\t1\t1\t1\t0\t0\t0\t2\t{s2}\t{q}\t1\n")
    out = tmp_path / "pe.sam"
    run_cli(["align", "-x", idx, "--qseq", "-1", str(f1), "-2", str(f2),
             "-S", str(out)])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 2
    assert all(int(r[1]) & 0x2 for r in recs)  # concordant pair
    assert sorted(int(r[3]) for r in recs) == [2001, 2201]


def test_un_conc_file_naming(genome, tmp_path):
    """--un-conc mate files: % substitutes the mate number, otherwise
    .1/.2 is inserted before the final extension (bowtie2 wrapper
    :519-536). Non-concordant pairs land one mate per file."""
    d, text, idx = genome
    rng = np.random.default_rng(9)
    junk1 = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
    junk2 = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
    f1, f2 = tmp_path / "m1.fq", tmp_path / "m2.fq"
    make_fastq(str(f1), [("p0", junk1, "I" * 80)])
    make_fastq(str(f2), [("p0", junk2, "I" * 80)])
    out = tmp_path / "o.sam"
    un = tmp_path / "un.fq"
    run_cli(["align", "-x", idx, "-1", str(f1), "-2", str(f2),
             "-S", str(out), "--un-conc", str(un)])
    assert (tmp_path / "un.1.fq").exists()
    assert (tmp_path / "un.2.fq").exists()
    assert not un.exists()
    assert "@p0" in (tmp_path / "un.1.fq").read_text()
    assert "@p0" in (tmp_path / "un.2.fq").read_text()


def test_un_mates_files(genome, tmp_path):
    """--un-mates: for pairs aligned neither concordantly nor
    discordantly, each unaligned mate goes to its per-mate file
    (bowtie2 wrapper :612-618). An aligned mate of a mixed pair is NOT
    dumped."""
    d, text, idx = genome
    rng = np.random.default_rng(10)
    junk = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
    good = dna.decode(text[5000:5080])
    f1, f2 = tmp_path / "m1.fq", tmp_path / "m2.fq"
    # p0: mate1 aligns, mate2 junk -> mixed pair; only mate2 dumped
    make_fastq(str(f1), [("p0", good, "I" * 80)])
    make_fastq(str(f2), [("p0", junk, "I" * 80)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-1", str(f1), "-2", str(f2),
             "-S", str(out), "--un-mates", str(tmp_path / "unm.fq")])
    m1 = (tmp_path / "unm.1.fq").read_text()
    m2 = (tmp_path / "unm.2.fq").read_text()
    assert "@p0" not in m1          # aligned mate not dumped
    assert "@p0" in m2 and junk in m2


def test_bam_preserve_tags(genome, tmp_path):
    """--preserve-tags: BAM aux fields reappear verbatim at the end of
    the output record, integer widths normalized to ':i:' and B arrays
    keeping their subtype (sam.cpp printPreservedOptFlags)."""
    import gzip
    import struct

    d, text, idx = genome
    from omp_bowtie2_prime_tpu.utils import dna as _dna

    seq = _dna.decode(text[900:1000])
    name = b"bt0"
    l_seq = len(seq)
    code = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}
    packed = bytearray()
    for i in range(0, l_seq, 2):
        hi = code[seq[i]] << 4
        lo = code[seq[i + 1]] if i + 1 < l_seq else 0
        packed.append(hi | lo)
    aux = b"RGZgrp1\x00"                       # RG:Z:grp1
    aux += b"NMc" + struct.pack("<b", 7)        # NM:c -> NM:i:7
    aux += b"XSS" + struct.pack("<H", 40000)    # XS:S -> XS:i:40000
    aux += b"ZFf" + struct.pack("<f", 1.5)      # ZF:f:1.500000
    aux += b"ZAA" + b"+"                        # ZA:A:+
    aux += b"ZBB" + b"c" + struct.pack("<I", 3) + struct.pack("<3b", 1, -2, 3)
    rec = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0, 4,
                      l_seq, -1, -1, 0)
    rec += name + b"\x00" + bytes(packed) + bytes([30] * l_seq) + aux
    body = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 0)
    body += struct.pack("<i", len(rec)) + rec
    p = tmp_path / "in.bam"
    with gzip.open(p, "wb") as f:
        f.write(body)
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-b", str(p), "--preserve-tags",
             "-S", str(out)])
    (line,) = [l for l in out.read_text().splitlines()
               if not l.startswith("@")]
    assert line.endswith(
        "\tRG:Z:grp1\tNM:i:7\tXS:i:40000\tZF:f:1.500000\tZA:A:+"
        "\tZB:B:c,1,-2,3"
    )
    # without the flag the aux block is dropped
    run_cli(["align", "-x", idx, "-b", str(p), "-S", str(out)])
    (line,) = [l for l in out.read_text().splitlines()
               if not l.startswith("@")]
    assert "RG:Z:grp1" not in line


def test_sam_append_comment(genome, tmp_path):
    """--sam-append-comment (sam.h printComment): the name's comment is
    appended after the tags; CASAVA-style comments get a BC:Z: prefix;
    a comment-less read still gets the trailing tab (reference quirk)."""
    d, text, idx = genome
    from omp_bowtie2_prime_tpu.utils import dna as _dna

    s1 = _dna.decode(text[100:180])
    s2 = _dna.decode(text[300:380])
    s3 = _dna.decode(text[500:580])
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [
        ("c1 1:N:0:ATCACG", s1, "I" * 80),
        ("c2 some free text", s2, "I" * 80),
        ("c3", s3, "I" * 80),
        ("c5 3:N:0:AA", s1, "I" * 80),
    ])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--sam-append-comment"])
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    by = {l.split("\t")[0]: l for l in lines}
    assert by["c1"].endswith("\tBC:Z:1:N:0:ATCACG")
    # a colon-free first token passes the CASAVA scan too (fork-pinned:
    # "BC:Z:some free text")
    assert by["c2"].endswith("\tBC:Z:some free text")
    assert by["c3"].endswith("\t")
    # read number 3 fails the CASAVA check -> raw comment, no BC:Z:
    assert by["c5"].endswith("\t3:N:0:AA") and "BC:Z" not in by["c5"]
    # rejected for non-FASTA/FASTQ inputs exactly like the reference
    import pytest as _pytest
    tab = tmp_path / "r.tab5"
    tab.write_text(f"t1\t{s1}\t{'I'*80}\t{s2}\t{'I'*80}\n")
    with _pytest.raises(SystemExit):
        run_cli(["align", "-x", idx, "--tab5", str(tab),
                 "-S", str(out), "--sam-append-comment"])


def test_fastq_vec_scalar_equivalence(tmp_path):
    """The vectorized FASTQ fast path must be indistinguishable from the
    scalar drain on odd-but-legal files: CRLF endings, blank lines
    between records (forces the scalar fallback mid-file), empty reads,
    missing trailing newline, '@'-only headers."""
    import numpy as np

    from omp_bowtie2_prime_tpu.io.fastq import (
        read_fastq, _drain_fastq_scalar,
    )

    rng = np.random.default_rng(5)

    def rand_rec(i, empty=False):
        n = 0 if empty else int(rng.integers(1, 90))
        seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, n))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, n))
        name = f"fz{i}" if i % 7 else "@"  # every 7th: bare '@' header
        head = "@" + (f"fz{i} extra words" if i % 3 else f"fz{i}")
        if i % 7 == 0:
            head = "@"
        return f"{head}\n{seq}\n+\n{qual}\n"

    variants = []
    base = "".join(rand_rec(i) for i in range(50))
    variants.append(("plain", base))
    variants.append(("crlf", base.replace("\n", "\r\n")))
    variants.append(("no_trailing_nl", base.rstrip("\n")))
    recs = [rand_rec(i) for i in range(30)]
    recs.insert(10, "\n\n")  # blank lines before a header
    variants.append(("blanks", "".join(recs)))
    variants.append(("empty_read", rand_rec(0) + rand_rec(1, empty=True)
                     + rand_rec(2)))
    variants.append(("empty_file", ""))

    for label, content in variants:
        p = tmp_path / f"{label}.fq"
        p.write_text(content)
        got = list(read_fastq(str(p)))
        # oracle: pure scalar drain over the whole stripped line list
        lines = [l.strip().encode() for l in content.split("\n")]
        want = _drain_fastq_scalar(lines, 0, False, final=True)
        assert len(got) == len(want), label
        for a, b in zip(got, want):
            assert a.name == b.name, label
            assert (np.asarray(a.seq) == np.asarray(b.seq)).all(), label
            assert (np.asarray(a.qual) == np.asarray(b.qual)).all(), label


def test_Q_quality_files_accepted_and_ignored(genome, tmp_path, capsys):
    """-Q/--Q1/--Q2 (legacy FASTA+qual inputs): the reference fork parses
    and validates them (-f required, bt2_search.cpp:1704-1708) but never
    consumes the files — no FastaQualPatternSource exists. We reproduce
    both the validation error and the ignore."""
    d, text, idx = genome
    fa = tmp_path / "r.fa"
    fa.write_text(">qf0\n" + dna.decode(text[800:880]) + "\n")
    qual = tmp_path / "r.qual"
    qual.write_text(">qf0\n" + " ".join(["30"] * 80) + "\n")
    out = tmp_path / "o.sam"
    # without -f: the reference's exact error
    with pytest.raises(SystemExit):
        run_cli(["align", "-x", idx, "-U", str(fa), "-Q", str(qual),
                 "-S", str(out)])
    assert "-Q works only in combination with -f" in capsys.readouterr().err
    # with -f: accepted; quals remain the FASTA default 'I'
    run_cli(["align", "-x", idx, "-f", "-U", str(fa), "-Q", str(qual),
             "-S", str(out)])
    (rec,) = [l.split("\t") for l in out.read_text().splitlines()
              if not l.startswith("@")]
    assert rec[3] == "801" and rec[10] == "I" * 80


def test_policy_string_overrides(genome, tmp_path):
    """--policy NAME=VAL tokens (SeedAlignmentPolicy::parsePolicy;
    -P itself takes a preset NAME like the reference, applyPreset):
    MMP=C,3 makes a high-qual mismatch cost 3; an explicit --mp beats the
    policy token."""
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    seq = list(dna.decode(text[1000:1080]))
    seq[40] = "ACGT"[("ACGT".index(seq[40]) + 1) % 4]
    make_fastq(str(fq), [("p0", "".join(seq), "I" * 80)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--policy", "MMP=C,3;SEEDLEN=20"])
    (rec,) = [l.split("\t") for l in out.read_text().splitlines()
              if not l.startswith("@")]
    assert "AS:i:-3" in rec
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--mp", "5,5", "--policy", "MMP=C,3"])
    (rec,) = [l.split("\t") for l in out.read_text().splitlines()
              if not l.startswith("@")]
    assert "AS:i:-5" in rec


def test_multiseed_expands_to_policy(genome, tmp_path):
    """--multiseed mms,len,F,a,b == SEED=..;SEEDLEN=..;IVAL=F,a,b
    (bt2_search.cpp:1455-1474)."""
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [("m0", dna.decode(text[3000:3080]), "I" * 80)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--multiseed", "0,20,S,1,0.75"])
    recs = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(recs) == 1 and "\t3001\t" in recs[0]


def test_refidx_and_fullref(genome, tmp_path):
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [("r0", dna.decode(text[100:180]), "I" * 80)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out), "--refidx"])
    txt = out.read_text()
    assert "@SQ\tSN:0\t" in txt
    (rec,) = [l.split("\t") for l in txt.splitlines() if not l.startswith("@")]
    assert rec[2] == "0"


def test_long_option_aliases(genome, tmp_path):
    """The reference getopt table's alias spellings all resolve."""
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [("a0", dna.decode(text[100:180]), "I" * 80)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "--sam-nohead", "--seedlen", "20", "--min-score", "L,-0.6,-0.6",
             "--integer-quals" if False else "--nondeterministic",
             "--ungapped", "--no-cache", "--tighten", "2",
             "--reads-per-batch", "16", "--wrapper", "basic-0"])
    txt = out.read_text()
    assert "@HD" not in txt and "@PG" not in txt
    assert any("\t101\t" in l for l in txt.splitlines())


def test_P_takes_preset_names(genome, tmp_path):
    """-P/--preset <name> applies a preset by name (bt2_search.cpp:1406,
    applyPreset); unknown names error."""
    d, text, idx = genome
    fq = tmp_path / "r.fq"
    make_fastq(str(fq), [("pp0", dna.decode(text[2000:2080]), "I" * 80)])
    out = tmp_path / "o.sam"
    run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
             "-P", "very-sensitive"])
    assert any("\t2001\t" in l for l in out.read_text().splitlines())
    with pytest.raises(SystemExit):
        run_cli(["align", "-x", idx, "-U", str(fq), "-S", str(out),
                 "-P", "MMP=C,3"])


def test_tab5_mixed_stream_muxing(genome, tmp_path):
    """--tab5/--12 muxes 3-field (unpaired) and 5-field (paired) records
    per LINE (TabbedPatternSource/PatternComposer, pat.h:961-1071):
    a mid-file shape switch must route pairs through the paired policy
    and singles through the unpaired engine, emitting in line order."""
    d, text, idx = genome
    up1 = dna.decode(text[1000:1080])
    m1 = dna.decode(text[3000:3080])
    m2 = dna.decode_rc(text[3200:3280]) if hasattr(dna, "decode_rc") else \
        dna.decode(dna.revcomp(text[3200:3280]))
    up2 = dna.decode(text[5000:5080])
    q = "I" * 80
    tab = tmp_path / "mix.tab5"
    tab.write_text(
        f"u1\t{up1}\t{q}\n"            # unpaired
        f"p1\t{m1}\t{q}\t{m2}\t{q}\n"  # paired (switch 3->5 fields)
        f"u2\t{up2}\t{q}\n"            # switch back 5->3
    )
    out = tmp_path / "mix.sam"
    run_cli(["align", "-x", idx, "--tab5", str(tab), "-S", str(out)])
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert [r[0] for r in recs] == ["u1", "p1", "p1", "u2"]  # line order
    flags = [int(r[1]) for r in recs]
    assert flags[0] == 0 and flags[3] == 0          # unpaired records
    assert flags[1] & 1 and flags[2] & 1            # paired flag set
    assert flags[1] & 64 and flags[2] & 128         # mate1 / mate2
    assert int(recs[0][3]) == 1001
    assert int(recs[1][3]) == 3001
    assert int(recs[3][3]) == 5001
    # concordant pair: proper-pair bit + symmetric TLEN
    assert flags[1] & 2 and flags[2] & 2
    assert int(recs[1][8]) == -int(recs[2][8]) != 0
