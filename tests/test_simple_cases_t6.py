"""Tranche 6 of the simple_tests.pl port: all-N reference robustness,
cross-chromosome discordant pairs, and the mate-unmapped flag contract.

Sources (scripts/test/simple_tests.pl): "Align should not fail when first
seq in ref is all Ns" (:~64), "Discordant with different chromosomes",
"MREVERSE flag is set if mate does not align" (:1190-1198, verified to
produce flags 89/165 at POS 51)."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu import cli
from omp_bowtie2_prime_tpu.utils import dna


def _align(tmp, fa_recs, reads1, reads2=None, extra=()):
    fa = tmp / "g.fa"
    with open(fa, "w") as f:
        for name, seq in fa_recs:
            f.write(f">{name}\n{seq}\n")
    idx = tmp / "g.npz"
    cli.main(["build", str(fa), str(idx)])
    f1 = tmp / "r1.fq"
    with open(f1, "w") as f:
        for name, seq in reads1:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = tmp / "o.sam"
    args = ["align", "-x", str(idx), "-S", str(out), *extra]
    if reads2 is None:
        args += ["-U", str(f1)]
    else:
        f2 = tmp / "r2.fq"
        with open(f2, "w") as f:
            for name, seq in reads2:
                f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
        args += ["-1", str(f1), "-2", str(f2)]
    cli.main(args)
    return [l.rstrip("\n").split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]


def test_all_n_reference_sequences(tmp_path):
    """All-N sequences contribute zero fragments but keep their @SQ slot
    and length; alignment to the real sequence is unaffected (the Perl
    'first seq all Ns' / 'multiple seqs all Ns' cases)."""
    rng = np.random.default_rng(3)
    body = dna.decode(rng.integers(0, 4, 300))
    recs = _align(
        tmp_path,
        [("allN1", "N" * 80), ("real", body), ("allN2", "N" * 8)],
        [("r0", body[100:180])],
    )
    (rec,) = recs
    assert rec[2] == "real" and rec[3] == "101" and rec[5] == "80M"


def test_discordant_across_chromosomes(tmp_path):
    """Unique mates on different chromosomes promote to a discordant pair:
    YT:Z:DP, RNEXT names the other chromosome, TLEN 0."""
    rng = np.random.default_rng(5)
    A = dna.decode(rng.integers(0, 4, 3000))
    B = dna.decode(rng.integers(0, 4, 3000))
    m1 = A[500:600]
    m2 = dna.decode(dna.revcomp(dna.encode(B[1000:1100])))
    recs = _align(tmp_path, [("cA", A), ("cB", B)],
                  [("p0", m1)], [("p0", m2)])
    assert len(recs) == 2
    r1 = next(r for r in recs if int(r[1]) & 0x40)
    r2 = next(r for r in recs if int(r[1]) & 0x80)
    assert int(r1[1]) == 97 and (r1[2], r1[3]) == ("cA", "501")
    assert r1[6] == "cB" and r1[7] == "1001" and r1[8] == "0"
    assert int(r2[1]) == 145 and (r2[2], r2[3]) == ("cB", "1001")
    assert r2[6] == "cA" and r2[7] == "501" and r2[8] == "0"
    assert all("YT:Z:DP" in r for r in recs)


# the Perl case's exact inputs (simple_tests.pl:1190-1198)
_MR_REF = ("TTCACCATTTTTCTTTTCGTTAACTTGCCGTCAGCCTTTTCTTTGACCTCTTCTTTCTGT"
           "TCATGTGTATTTGCTGTCTCTTAGCCCAGACTTCCCGTGTCCTTTCCACCGGGCCTTTGA"
           "GAGGTCACAGGGTCTTGATGCTGTGGTCTTCATCTGCAGGTGTCTGACTTCCAGCAACTG"
           "CTGGCCTGTGCCAGGGTGCAAGCTGAGCACTGGAGTGGAGTTTTCCTGTGGAGAGGAGCC"
           "ATGCCTAGAG")
_MR_M1 = ("AAGACCACAGCATCAAGACCCTGTGACCTCTCAAAGGCCCGGTGGAAAGGACACGGGAAG"
          "TCTGGGCTAAGAGACAGCAAATACACATGAACAGAAAGAA")
_MR_M2 = ("CAGCGGCCCTGCCTCCTACCCTTGCGCCTCATGACCAGCTTGTTGAAGAGATCCGACATC"
          "AAGTGCCCACCTTGGCTCGTGGCTCTCACTGCAACGGGAA")


def test_mreverse_flag_when_mate_unaligned(tmp_path):
    """simple_tests.pl 'MREVERSE flag is set if mate does not align':
    mate1 aligns reverse at 0-based 50 with flags 1|8|16|64 = 89; the
    unaligned mate2 record carries 1|4|32|128 = 165 (MREVERSE mirrors the
    aligned mate's strand) and the mate's RNAME/POS."""
    recs = _align(tmp_path, [("t0", _MR_REF)],
                  [("p0", _MR_M1)], [("p0", _MR_M2)])
    by = {int(r[1]): r for r in recs}
    assert set(by) == {89, 165}
    assert by[89][3] == "51"
    assert by[165][2] == "t0" and by[165][3] == "51"
    assert any("YT:Z:UP" in t for t in by[89])
