"""Round-10 invariants: evidence guards on the phash retrieval/dedup
rows (a trivially-small result must fail loudly, never hash-match an
equally-trivial oracle), plus the round's new-operator contracts."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_phash_topk_guard_fires_on_starved_candidate_set(spark, monkeypatch):
    """Raising the floor above any possible candidate count simulates
    the regression class the guard exists for (band layout or
    thumbnail kernel change that empties the banded probe): the query
    must FAIL, not return a tiny result."""
    from qms_datawarehouse_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_PHASH_MIN_CANDIDATES", 10**6)
    with pytest.raises(AssertionError, match="banded probe yielded only"):
        mm.similarity_image_phash_topk(spark, SF_DIR)


def test_phash_topk_returns_nontrivial_result(spark):
    from qms_datawarehouse_spark.operators import multimodal as mm

    rows = mm.similarity_image_phash_topk(spark, SF_DIR).collect()
    assert len(rows) >= mm._PHASH_MIN_CANDIDATES
    assert {"doc_id", "hamming"} == set(rows[0].asDict())


def test_audio_fingerprint_total_and_deterministic():
    """Kernel contract: total over b'' / short payloads (pads to 3
    NULs — all-zero profile), deterministic, and near-identical
    payloads land within the Hamming threshold while the image and
    audio kernels DISAGREE on unrelated payloads (independent
    evidence, not a renamed copy)."""
    from qms_datawarehouse_spark.operators.multimodal import (
        AUDIO_FP_CELLS,
        fake_audio_energy_profile,
        fake_image_grid,
    )

    assert fake_audio_energy_profile(b"") == [0] * AUDIO_FP_CELLS
    assert fake_audio_energy_profile(b"a") == fake_audio_energy_profile(
        b"a"
    )
    base = ("the quick brown fox " * 40).encode()
    near = base.replace(b"quick", b"quack", 1)
    far = ("zz yy xx ww vv uu " * 40).encode()

    def bits(profile):
        return [
            1 if profile[k] < profile[k + 1] else 0
            for k in range(AUDIO_FP_CELLS - 1)
        ]

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    pb, pn, pf = (
        bits(fake_audio_energy_profile(t)) for t in (base, near, far)
    )
    assert ham(pb, pn) <= 3  # small edit stays a near-dup
    assert ham(pb, pf) > 3  # unrelated payloads separate
    # independence from the image kernel: different feature domains
    assert fake_audio_energy_profile(base)[:64] != fake_image_grid(base)[:64]


def test_audio_fp_spark_kernel_matches_python_reference(spark):
    """The vectorized Arrow kernel and the scalar python reference
    agree band-for-band on real fixture payloads."""
    from qms_datawarehouse_spark.operators.multimodal import (
        AUDIO_FP_SCHEMA,
        audio_fp_bands,
        fake_audio_energy_profile,
        with_binary_content,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    blobs = with_binary_content(docs).select("doc_id", "content")
    got = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in blobs.mapInPandas(
            audio_fp_bands, schema=AUDIO_FP_SCHEMA
        ).collect()
    }
    for r in blobs.collect():
        p = fake_audio_energy_profile(bytes(r.content))
        bands = [0, 0, 0, 0]
        for j in range(64):
            bands[j // 16] |= (1 if p[j] < p[j + 1] else 0) << (j % 16)
        assert got[r.doc_id] == tuple(bands), r.doc_id


def test_audio_dedup_returns_nonempty_verified_pairs(spark):
    from qms_datawarehouse_spark.operators import multimodal as mm

    rows = mm.dedup_audio_fingerprint(spark, SF_DIR).collect()
    assert rows  # the evidence guard passed
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.hamming <= mm._AUDIO_FP_T


def test_audio_kernel_is_reversal_invariant_image_kernel_is_not():
    """The two multimodal fingerprints differ in a PROVABLE way, not
    just by constants: the audio energy bag (commutative 3-byte
    window sums) is invariant under payload reversal, while the image
    bigram hash (a*31 + b, non-commutative) is not — this is why the
    audio write probe decorrelates its batch with a letter rotation
    where the image probe can use reversal."""
    from qms_datawarehouse_spark.operators.multimodal import (
        fake_audio_energy_profile,
        fake_image_grid,
    )

    base = ("the quick brown fox jumps over the lazy dog " * 12).encode()
    assert fake_audio_energy_profile(base) == fake_audio_energy_profile(
        base[::-1]
    )
    assert fake_image_grid(base) != fake_image_grid(base[::-1])


def test_chromaprint_seam_gated_on_library():
    """The real-codec twin raises the DEPENDENCY when librosa is
    absent (auto-activates the moment the image gains the lib)."""
    from qms_datawarehouse_spark.operators.multimodal import (
        chromaprint_energy_profile,
    )

    try:
        import librosa  # noqa: F401

        has_lib = True
    except ImportError:
        has_lib = False
    if not has_lib:
        with pytest.raises(ImportError):
            chromaprint_energy_profile(b"payload")
    else:
        with pytest.raises(NotImplementedError):
            chromaprint_energy_profile(b"payload")


def test_audio_topk_guard_fires_on_starved_candidate_set(spark, monkeypatch):
    """Same regression class as the image twin: an energy-profile or
    band-packing change that empties the banded probe must FAIL the
    query, not return a tiny hash-matchable result."""
    from qms_datawarehouse_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_AUDIO_FP_MIN_CANDIDATES", 10**6)
    with pytest.raises(AssertionError, match="banded probe yielded only"):
        mm.similarity_audio_fp_topk(spark, SF_DIR)


def test_audio_topk_returns_nontrivial_result(spark):
    from qms_datawarehouse_spark.operators import multimodal as mm

    rows = mm.similarity_audio_fp_topk(spark, SF_DIR).collect()
    assert len(rows) >= mm._AUDIO_FP_MIN_CANDIDATES
    assert {"doc_id", "hamming"} == set(rows[0].asDict())
    # ranked ascending, deterministic tiebreak
    assert [
        (r.hamming, r.doc_id) for r in rows
    ] == sorted((r.hamming, r.doc_id) for r in rows)


def test_audio_kernel_property_vectorized_equals_scalar():
    """Hypothesis: over ARBITRARY byte payloads (not just fixture
    text) the vectorized Arrow kernel and the scalar python reference
    agree band-for-band — padding, plateau bits, and the 16-bit pack
    have no payload-shape edge cases. Runs the pandas generator
    directly (no Spark session needed)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pandas as pd

    from qms_datawarehouse_spark.operators.multimodal import (
        audio_fp_bands,
        fake_audio_energy_profile,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=8)
    )
    def check(payloads):
        pdf = pd.DataFrame(
            {"doc_id": range(len(payloads)), "content": payloads}
        )
        (out,) = list(audio_fp_bands(iter([pdf])))
        for i, content in enumerate(payloads):
            p = fake_audio_energy_profile(content)
            bands = [0, 0, 0, 0]
            for j in range(64):
                bands[j // 16] |= (1 if p[j] < p[j + 1] else 0) << (j % 16)
            got = [int(out[f"b{k}"].iloc[i]) for k in range(4)]
            assert got == bands, (content, got, bands)
            # 16-bit pack invariant: never a signed-64 value
            assert all(0 <= b < 65536 for b in got)

    check()


def test_cross_modal_guard_fires_on_degenerate_split(spark, monkeypatch):
    """A regression that collapses either pair generator (or the
    class split) must FAIL the audit, not ship a vacuous result."""
    from qms_datawarehouse_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_XMODAL_MIN_PAIRS", 10**6)
    with pytest.raises(AssertionError, match="agreement classes"):
        mm.dedup_cross_modal_agreement(spark, SF_DIR)


def test_cross_modal_agreement_classes_and_bounds(spark):
    """Per-pair sanity: class label consistent with which metric is
    present; jacc_bp >= 5000 (the 0.5 threshold in basis points) on
    text-flagged pairs; hamming <= T on image-flagged pairs."""
    from qms_datawarehouse_spark.operators import multimodal as mm

    rows = mm.dedup_cross_modal_agreement(spark, SF_DIR).collect()
    assert len(rows) >= mm._XMODAL_MIN_PAIRS
    classes = {r.agreement for r in rows}
    assert len(classes) >= mm._XMODAL_MIN_CLASSES
    for r in rows:
        assert r.doc_a < r.doc_b
        if r.agreement == "both":
            assert r.jacc_bp is not None and r.hamming is not None
        elif r.agreement == "text_only":
            assert r.jacc_bp is not None and r.hamming is None
        else:
            assert r.agreement == "image_only"
            assert r.jacc_bp is None and r.hamming is not None
        if r.jacc_bp is not None:
            assert r.jacc_bp >= 5000
        if r.hamming is not None:
            assert r.hamming <= mm._PHASH_T


def test_phash_dedup_returns_nonempty_pairs(spark):
    """The dedup row's evidence guard passed == the result is
    non-empty; also re-pin pair sanity (a < b, hamming <= T)."""
    from qms_datawarehouse_spark.operators import multimodal as mm

    rows = mm.dedup_image_phash(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.hamming <= mm._PHASH_T
