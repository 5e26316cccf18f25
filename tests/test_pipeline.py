"""models/pipeline.py: ordered emission and error propagation, incl. the
two-align-worker overlap mode (the reference analog is the reader-thread +
OutputQueue contract, pat.h:1283-1402 / outq.h:31-160: output must be in
input order regardless of worker interleaving)."""

import time

import pytest

from omp_bowtie2_prime_tpu.models.pipeline import run_pipeline


def test_single_worker_order():
    got = []
    n = run_pipeline(
        iter([[1, 2], [3], [4, 5, 6]]),
        lambda b: [x * 10 for x in b],
        lambda b, r: got.append((b, r)),
    )
    assert n == 6
    assert got == [([1, 2], [10, 20]), ([3], [30]), ([4, 5, 6], [40, 50, 60])]


def test_two_workers_emit_in_input_order():
    # stagger worker latency so completion order differs from input order
    def mk(delay_even):
        def fn(b):
            if (b[0] % 2 == 0) == delay_even:
                time.sleep(0.05)
            return [x * 10 for x in b]

        return fn

    got = []
    batches = [[i] for i in range(12)]
    n = run_pipeline(
        iter(batches), None, lambda b, r: got.append(b[0]),
        align_fns=[mk(True), mk(False)],
    )
    assert n == 12
    assert got == list(range(12))


def test_two_workers_results_match_single():
    batches = [[i, i + 1] for i in range(0, 20, 2)]
    fn = lambda b: [x * x for x in b]  # noqa: E731
    single, multi = [], []
    run_pipeline(iter(batches), fn, lambda b, r: single.append(r))
    run_pipeline(iter(batches), None, lambda b, r: multi.append(r),
                 align_fns=[fn, fn])
    assert single == multi


def test_align_error_propagates():
    def bad(b):
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        run_pipeline(iter([[1]]), bad, lambda b, r: None)
    with pytest.raises(ValueError, match="boom"):
        run_pipeline(iter([[i] for i in range(8)]), None,
                     lambda b, r: None, align_fns=[bad, bad])


def test_emit_error_propagates_two_workers():
    def emit(b, r):
        raise RuntimeError("writer died")

    with pytest.raises(RuntimeError, match="writer died"):
        run_pipeline(iter([[i] for i in range(8)]), None, emit,
                     align_fns=[lambda b: b, lambda b: b])


def test_two_aligner_workers_match_single():
    """Two TPUAligner instances over a shared index, driven concurrently
    through the pipeline, must reproduce the single-aligner results
    exactly (the -p 2 CLI mode; the reference analog is scripts/sim's
    single- vs multi-threaded output identity contract)."""
    import numpy as np

    from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
    from omp_bowtie2_prime_tpu.index.fasta import join_references
    from omp_bowtie2_prime_tpu.io.fastq import Read
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
    from omp_bowtie2_prime_tpu.utils import dna

    rng = np.random.default_rng(57)
    text = rng.integers(0, 4, 20000).astype(np.int8)
    joined, refmap = join_references(["chrW"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    reads = []
    for i in range(120):
        pos = int(rng.integers(0, len(text) - 100))
        seq = text[pos: pos + 100].copy()
        p = int(rng.integers(5, 95))
        seq[p] = (seq[p] + 1) % 4
        if rng.integers(0, 2):
            seq = dna.revcomp(seq)
        reads.append(Read(i, f"w{i}", seq.astype(np.int8),
                          np.full(100, 35, np.uint8)))
    batches = [reads[i: i + 30] for i in range(0, 120, 30)]

    al = TPUAligner(fm)
    single = []
    run_pipeline(iter(batches), al.align_batch,
                 lambda b, r: single.extend(r))

    al1, al2 = TPUAligner(fm), TPUAligner(fm)
    multi = []
    run_pipeline(iter(batches), None, lambda b, r: multi.extend(r),
                 align_fns=[al1.align_batch, al2.align_batch])

    assert len(single) == len(multi) == 120
    for a, b in zip(single, multi):
        assert (a.status, getattr(a, "refoff", None),
                getattr(a, "fw", None), getattr(a, "score", None),
                getattr(a, "mapq", None)) == \
               (b.status, getattr(b, "refoff", None),
                getattr(b, "fw", None), getattr(b, "score", None),
                getattr(b, "mapq", None))


def test_align_stream_matches_serial():
    """align_stream (cross-batch round-0 pre-dispatch) must reproduce the
    serial align_batch results exactly — identical per-batch state, same
    executables, only the dispatch ORDER differs."""
    import numpy as np

    from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
    from omp_bowtie2_prime_tpu.index.fasta import join_references
    from omp_bowtie2_prime_tpu.io.fastq import Read
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner
    from omp_bowtie2_prime_tpu.models.pipeline import align_stream
    from omp_bowtie2_prime_tpu.utils import dna

    rng = np.random.default_rng(91)
    text = rng.integers(0, 4, 20000).astype(np.int8)
    # a 40-copy exact repeat exercises the wide-range sampler through
    # both the serial and pre-dispatched megas
    unit = rng.integers(0, 4, 120).astype(np.int8)
    for p in range(500, 500 + 40 * 300, 300):
        text[p : p + 120] = unit
    joined, refmap = join_references(["chrS"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    reads = []
    for i in range(150):
        if i % 3 == 0:
            seq = unit[10:110].copy()
        else:
            pos = int(rng.integers(0, len(text) - 100))
            seq = text[pos : pos + 100].copy()
            seq[int(rng.integers(5, 95))] += 1
            seq %= 4
        if rng.integers(0, 2):
            seq = dna.revcomp(seq)
        reads.append(Read(i, f"s{i}", seq.astype(np.int8),
                          np.full(100, 35, np.uint8)))
    batches = [reads[i : i + 30] for i in range(0, 150, 30)]

    al = TPUAligner(fm)
    serial = [al.align_batch(b) for b in batches]

    a1 = TPUAligner(fm)
    a2 = TPUAligner(fm, share=a1)
    emitted = []
    streamed = align_stream([a1, a2], batches,
                            emit_fn=lambda k, r: emitted.append(k))
    assert emitted == list(range(len(batches)))
    for sb, tb in zip(serial, streamed):
        for a, b in zip(sb, tb):
            assert (a.status, getattr(a, "refoff", None),
                    getattr(a, "fw", None), getattr(a, "score", None),
                    getattr(a, "mapq", None), getattr(a, "secbest", None)) \
                == (b.status, getattr(b, "refoff", None),
                    getattr(b, "fw", None), getattr(b, "score", None),
                    getattr(b, "mapq", None), getattr(b, "secbest", None))


def test_producer_error_propagates():
    def batches():
        yield [1]
        raise OSError("parse fail")

    with pytest.raises(OSError, match="parse fail"):
        run_pipeline(batches(), lambda b: b, lambda b, r: None)
