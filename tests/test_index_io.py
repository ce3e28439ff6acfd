"""Index persistence + incremental update (FTS and IVF lifecycle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_table

    return read_table(spark, sf_dir, "documents").select("doc_id", "text").cache()


def _bm25(index, terms, k=10):
    from odsc_agentic_ai_summit_2025_spark.operators.fts import (
        bm25_topk_indexed,
    )

    return sorted(
        map(tuple, bm25_topk_indexed(index, terms, k=k).collect())
    )


def test_fts_incremental_equals_full_build(spark, docs):
    """build(half1) + add(half2) must serve identical BM25 results to
    build(full) — postings, df, and corpus stats all merge right."""
    from odsc_agentic_ai_summit_2025_spark.operators.fts import (
        build_fts_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        fts_add_documents,
    )

    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    full = build_fts_index(docs, "text", "doc_id")
    merged = fts_add_documents(
        build_fts_index(half1, "text", "doc_id"), half2, "text", "doc_id"
    )
    assert merged.n_docs == full.n_docs
    assert merged.avgdl == pytest.approx(full.avgdl)
    terms = ["table", "row", "fast"]
    assert _bm25(merged, terms) == _bm25(full, terms)


def test_fts_add_is_idempotent(spark, docs):
    """Re-adding already-indexed docs changes nothing (the
    reference's idempotent re-ingest)."""
    from odsc_agentic_ai_summit_2025_spark.operators.fts import (
        build_fts_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        fts_add_documents,
    )

    idx = build_fts_index(docs, "text", "doc_id")
    again = fts_add_documents(idx, docs.limit(50), "text", "doc_id")
    assert again.n_docs == idx.n_docs
    assert again.postings.count() == idx.postings.count()


def test_fts_save_load_roundtrip(spark, docs, tmp_path):
    from odsc_agentic_ai_summit_2025_spark.operators.fts import (
        build_fts_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        load_fts_index,
        save_fts_index,
    )

    idx = build_fts_index(docs, "text", "doc_id")
    save_fts_index(idx, str(tmp_path / "fts"))
    loaded = load_fts_index(spark, str(tmp_path / "fts"))
    assert loaded.n_docs == idx.n_docs
    assert loaded.avgdl == pytest.approx(idx.avgdl)
    terms = ["window", "query"]
    assert _bm25(loaded, terms) == _bm25(idx, terms)


def test_ivf_lifecycle_roundtrip_and_incremental(spark, sf_dir, tmp_path):
    """Save/load preserves search results; incremental add with the
    frozen quantizer stays EXACT at nprobe=K over the merged corpus
    (the same property the q47 oracle relies on)."""
    from odsc_agentic_ai_summit_2025_spark.functions.embedder import embed
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        ivf_add_documents,
        load_ivf_index,
        save_ivf_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.ivf import (
        ivf_build,
        ivf_search,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.similarity import (
        knn_bruteforce,
    )
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    vecs = embed(docs, "text", "vector", dim=32).select(
        "doc_id", "vector"
    ).cache()
    half1 = vecs.filter(F.col("doc_id") % 2 == 0)
    half2 = vecs.filter(F.col("doc_id") % 2 == 1)
    queries = vecs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"), "vector"
    )

    K = 8
    idx = ivf_build(half1, "vector", "doc_id", k_clusters=K)

    # save → load → identical search
    save_ivf_index(idx, str(tmp_path / "ivf"))
    loaded = load_ivf_index(spark, str(tmp_path / "ivf"))
    a = sorted(map(tuple, ivf_search(idx, queries, "qid", k=5, nprobe=K).collect()))
    b = sorted(map(tuple, ivf_search(loaded, queries, "qid", k=5, nprobe=K).collect()))
    assert a == b

    # incremental add: nprobe=K over the merged index == exact kNN
    # (ivf_search always drops n_id == q_id, so compare with
    # exclude_self=True)
    merged = ivf_add_documents(idx, half2)
    assert merged.assigned.count() == vecs.count()
    got = {
        (r["q_id"], r["n_id"])
        for r in ivf_search(merged, queries, "qid", k=5, nprobe=K).collect()
    }
    exact = {
        (r["q_id"], r["n_id"])
        for r in knn_bruteforce(
            vecs, queries, "vector", "doc_id", "qid", k=5, exclude_self=True
        ).collect()
    }
    assert got == exact

    # idempotent re-add
    again = ivf_add_documents(merged, half2.limit(20))
    assert again.assigned.count() == merged.assigned.count()


def test_bm25_bag_semantics_weights_repeated_query_terms(spark):
    """A repeated query term must weight its score by its query-term
    frequency (tantivy/LanceDB score each occurrence) — before the r5
    fix duplicates collapsed to set semantics."""
    from odsc_agentic_ai_summit_2025_spark.operators.fts import (
        bm25_scores,
    )

    rows = [
        (1, "apple banana cherry"),   # has 'apple' once
        (2, "banana cherry date"),    # no 'apple', has 'banana'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = {
        r["doc"]: r["score"]
        for r in bm25_scores(df, "text", "doc_id", ["apple", "banana"]).collect()
    }
    twice = {
        r["doc"]: r["score"]
        for r in bm25_scores(
            df, "text", "doc_id", ["apple", "apple", "banana"]
        ).collect()
    }
    # doc 1's apple term-score doubles; banana contributions unchanged
    apple_part = once[1] - twice[1] + once[1]  # = 2*once_apple... sanity below
    assert twice[1] > once[1]
    assert abs(twice[2] - once[2]) < 1e-12  # no apple in doc 2
    # exact: twice[1] - once[1] == the single-apple term score
    single_apple = {
        r["doc"]: r["score"]
        for r in bm25_scores(df, "text", "doc_id", ["apple"]).collect()
    }
    assert abs((twice[1] - once[1]) - single_apple[1]) < 1e-12


# ---------------------------------------------------------------------------
# Folded from test_review_r5d: IVF cosine assignment invariance
# ---------------------------------------------------------------------------


def test_ivf_cosine_assignment_on_unnormalized_corpus(spark):
    from odsc_agentic_ai_summit_2025_spark.operators import ivf

    # same directions at wildly different magnitudes: cosine clusters
    # by direction; L2 would split by magnitude and an exact-direction
    # duplicate could land outside its query's top-nprobe cluster
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for d in range(20):
        v = rng.normal(size=16)
        for mag in (0.01, 1.0, 100.0):
            rows.append((vid, (mag * v).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vid long, vec array<double>")
    index = ivf.ivf_build(df, "vec", "vid", k_clusters=4, seed=1)
    by_cluster = {
        r["vid"]: r["cluster_id"] for r in index.assigned.collect()
    }
    index.release()
    # exactly-parallel vectors share a cluster regardless of
    # magnitude — the invariance the cosine probe requires (the old
    # L2 assignment binned by magnitude instead)
    for d in range(20):
        trio = {by_cluster[3 * d + j] for j in range(3)}
        assert len(trio) == 1, (d, trio)


# ---------------------------------------------------------------------------
# Near-dup MinHash signature index lifecycle (VERDICT r10 #3)
# ---------------------------------------------------------------------------


def _admit(sigs, delivery, bands=None):
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        neardup_admit_incremental,
    )

    return sorted(
        map(
            tuple,
            neardup_admit_incremental(
                sigs, delivery, "text", "doc_id", existing_bands=bands
            ).collect(),
        )
    )


def test_neardup_multi_delivery_add_equals_rebuild(spark, docs):
    """The daily-ingest loop closed: admit delivery A -> append the
    admitted docs (neardup_index_add) -> admit delivery B against the
    EXTENDED index == admitting B against a FULL REBUILD over
    corpus + admitted-A, row-for-row."""
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        build_neardup_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        neardup_index_add,
    )

    corpus = docs.filter(F.col("doc_id") % 3 == 1)
    delivery_a = docs.filter(F.col("doc_id") % 3 == 2)
    delivery_b = docs.filter(F.col("doc_id") % 3 == 0)

    idx = build_neardup_index(corpus, "text", "doc_id")
    admit_a = _admit(idx.sigs, delivery_a, idx.bands)
    admitted_ids = [r[0] for r in admit_a if r[1]]
    assert len(admitted_ids) >= 2, "fixture must admit several docs"
    # index a STRICT subset of the admitted docs: the add must handle
    # an admitted_docs frame smaller than the admit result (a caller
    # may route some admitted docs elsewhere), and rebuild-equivalence
    # must hold for whatever subset was actually indexed
    indexed = admitted_ids[: len(admitted_ids) // 2]
    admitted_docs = delivery_a.filter(F.col("doc_id").isin(indexed))
    idx2 = neardup_index_add(idx, admitted_docs, "text")

    rebuilt = build_neardup_index(
        corpus.unionByName(admitted_docs), "text", "doc_id"
    )
    # the index tables themselves agree...
    assert sorted(map(tuple, idx2.sigs.collect())) == sorted(
        map(tuple, rebuilt.sigs.collect())
    )
    assert sorted(map(tuple, idx2.bands.collect())) == sorted(
        map(tuple, rebuilt.bands.collect())
    )
    # ...and so does the NEXT delivery's admission through them
    assert _admit(idx2.sigs, delivery_b, idx2.bands) == _admit(
        rebuilt.sigs, delivery_b, rebuilt.bands
    )


def test_neardup_add_is_idempotent(spark, docs):
    """Re-ingesting an already-indexed delivery is a no-op (anti-join
    on id), like FTS/IVF/PQ adds."""
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        build_neardup_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        neardup_index_add,
    )

    half = docs.filter(F.col("doc_id") % 2 == 0)
    idx = build_neardup_index(half, "text", "doc_id")
    n_sigs = idx.sigs.count()
    again = neardup_index_add(idx, half.limit(40), "text")
    assert again.sigs.count() == n_sigs
    assert again.bands.count() == idx.bands.count()


def test_neardup_save_load_roundtrip(spark, docs, tmp_path):
    """Parquet round-trip preserves both tables; the loaded index
    admits identically to the in-memory one."""
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        build_neardup_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        load_neardup_index,
        save_neardup_index,
    )

    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delivery = docs.filter(F.col("doc_id") % 3 == 0)
    idx = build_neardup_index(corpus, "text", "doc_id")
    save_neardup_index(idx, str(tmp_path / "nd"))
    loaded = load_neardup_index(spark, str(tmp_path / "nd"))
    assert loaded.id_col == "doc_id"
    assert sorted(map(tuple, loaded.sigs.collect())) == sorted(
        map(tuple, idx.sigs.collect())
    )
    assert _admit(loaded.sigs, delivery, loaded.bands) == _admit(
        idx.sigs, delivery, idx.bands
    )


def test_minhash_signatures_derive_id_type(spark):
    """ADVICE r10: the signature kernel's output schema derives the
    id field's type from the input — string ids must work, not
    miscast through a hardcoded int64."""
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta gamma"), ("c", None)],
        "key string, text string",
    )
    sigs = minhash_signatures(df, "text", "key")
    assert sigs.schema["key"].dataType.simpleString() == "string"
    rows = {r["key"]: r["sig"] for r in sigs.collect()}
    assert set(rows) == {"a", "b"}
    assert all(len(s) == 16 for s in rows.values())


def test_neardup_empty_index_bootstrap(spark, docs, tmp_path):
    """Day-0 lifecycle: build over an EMPTY corpus, save, load (the
    partitioned bands write emits no part files — the load declares
    the schema from the meta row instead of inferring), then admit
    the first delivery against it and extend."""
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        build_neardup_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        load_neardup_index,
        neardup_index_add,
        save_neardup_index,
    )

    empty = docs.filter(F.lit(False))
    idx = build_neardup_index(empty, "text", "doc_id")
    save_neardup_index(idx, str(tmp_path / "nd0"))
    loaded = load_neardup_index(spark, str(tmp_path / "nd0"))
    assert loaded.sigs.count() == 0
    assert loaded.bands.count() == 0
    assert loaded.bands.columns == ["doc_id", "band_id", "bucket_key"]
    delivery = docs.filter(F.col("doc_id") < 60)
    admit = _admit(loaded.sigs, delivery, loaded.bands)
    # nothing to collide with in an empty corpus: every non-null doc
    # is either new or a within-batch dup
    assert all(r[2] in ("new", "dup_in_batch", "null_text") for r in admit)
    grown = neardup_index_add(
        loaded, delivery.filter(F.col("doc_id") < 30), "text"
    )
    assert grown.sigs.count() > 0
