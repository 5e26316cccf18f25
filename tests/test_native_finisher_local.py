"""Local mode must route through the native CIGAR/MD finisher (csrc/sais.cpp
bt_finish_batch row_los/clip_his soft-clip support) without falling back to
the per-candidate Python backtrace path."""
import numpy as np
import pytest

from omp_bowtie2_prime_tpu import native


def test_native_finisher_used_in_local(monkeypatch):
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    import omp_bowtie2_prime_tpu.models.aligner as A
    import test_local as T
    calls = {"native": 0, "fallback": 0}
    # two native entry points: the columnar single-candidate table
    # (native.finish_batch inside _finalize_singles_table) and the
    # multi-candidate object path (_finish_candidates_native); a
    # fallback from either means the per-record Python backtrace ran
    orig = A.TPUAligner._finish_candidates_native
    def wrapped(self, cands):
        r = orig(self, cands)
        calls["native"] += 1
        if not r:
            calls["fallback"] += 1
        return r
    monkeypatch.setattr(A.TPUAligner, "_finish_candidates_native", wrapped)
    orig_fb = native.finish_batch
    def wrapped_fb(*a, **kw):
        r = orig_fb(*a, **kw)
        calls["native"] += 1
        if r is None:
            calls["fallback"] += 1
        return r
    monkeypatch.setattr(native, "finish_batch", wrapped_fb)
    rng = np.random.default_rng(77)
    text = rng.integers(0, 4, 20000).astype(np.int8)
    from omp_bowtie2_prime_tpu.index.fasta import join_references
    from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
    from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts
    from omp_bowtie2_prime_tpu.utils.presets import PRESETS_LOCAL
    joined, refmap = join_references(["chrL"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    pl = PRESETS_LOCAL["sensitive-local"]
    al = TPUAligner(
        fm, T._local_scoring(),
        AlignOpts(local=True, seed_len=pl.seed_len, ival=pl.ival,
                  nrounds=pl.nrounds, dps=pl.dps),
    )
    g = (text, fm, al)
    T.test_local_soft_clips_garbage_flanks(g)
    T.test_local_rc_clip_orientation(g)
    print("calls:", calls)
    assert calls["native"] >= 1
    assert calls["fallback"] == 0
