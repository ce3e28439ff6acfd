"""Product-quantization ANN (operators/pq.py): exactness in the
oracle configuration, recall at realistic shortlists, deterministic
encoding, and cache hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from odsc_agentic_ai_summit_2025_spark.operators.pq import pq_build, pq_search
from odsc_agentic_ai_summit_2025_spark.operators.similarity import (
    knn_bruteforce,
)
from odsc_agentic_ai_summit_2025_spark.sources.io import read_table


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_pq_full_shortlist_equals_bruteforce(spark, sf_dir):
    """shortlist ≥ corpus ⇒ every row reaches the exact re-rank, so
    the ADC ordering is irrelevant and the output must equal exact
    kNN bit-for-bit — the contract that makes q76 oracle-checkable."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    idx = pq_build(emb, "embedding", "vec_id", m_subspaces=16, k_codewords=32)
    got = sorted(
        map(
            tuple,
            pq_search(
                idx, emb, queries, "vec_id", k=4, shortlist=10**9
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            knn_bruteforce(
                emb, queries, "embedding", "vec_id", "vec_id", k=4
            ).collect(),
        )
    )
    idx.release()
    assert got == want


def test_pq_recall_at_realistic_shortlist(spark, sf_dir):
    """With a shortlist ~6% of the corpus the ADC ordering carries
    the result: recall@3 against exact kNN must stay high (the 16-
    codeword/8-subspace codebook on 64-dim hash embeddings is a
    coarse quantizer, so demand 'clearly working', not perfection)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    idx = pq_build(emb, "embedding", "vec_id", m_subspaces=16, k_codewords=32)
    approx = {
        (r["q_id"], r["n_id"])
        for r in pq_search(
            idx, emb, queries, "vec_id", k=3, shortlist=32
        ).collect()
    }
    exact = {
        (r["q_id"], r["n_id"])
        for r in knn_bruteforce(
            emb, queries, "embedding", "vec_id", "vec_id", k=3
        ).collect()
    }
    idx.release()
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"recall@3 = {recall:.2f}"


def test_pq_codes_deterministic_and_bounded(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = pq_build(emb, "embedding", "vec_id", m_subspaces=16, k_codewords=32)
    b = pq_build(emb, "embedding", "vec_id", m_subspaces=16, k_codewords=32)
    ra = {r["vec_id"]: list(r["code"]) for r in a.codes.collect()}
    rb = {r["vec_id"]: list(r["code"]) for r in b.codes.collect()}
    a.release()
    b.release()
    assert ra == rb
    assert all(len(c) == 16 for c in ra.values())
    assert all(0 <= x < 32 for c in ra.values() for x in c)


def test_pq_release_hygiene(spark, sf_dir):
    from tests.test_cache_hygiene import _clean_baseline, _n_blocks

    emb = _emb(spark, sf_dir)
    baseline = _clean_baseline(spark)
    idx = pq_build(emb, "embedding", "vec_id", m_subspaces=16, k_codewords=32)
    queries = emb.filter(F.col("vec_id") < 3)
    out = pq_search(idx, emb, queries, "vec_id", k=3, shortlist=16)
    out.count()
    assert _n_blocks(spark) > baseline
    idx.release()
    assert _n_blocks(spark) == baseline


def test_ivfpq_oracle_config_equals_bruteforce(spark, sf_dir):
    """nprobe=K and shortlist ≥ corpus ⇒ both approximation knobs
    degrade away ⇒ exact kNN, bit-for-bit (the q79 oracle contract)."""
    from odsc_agentic_ai_summit_2025_spark.operators.ivf import ivf_build
    from odsc_agentic_ai_summit_2025_spark.operators.pq import ivfpq_search

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    ivf = ivf_build(emb, "embedding", "vec_id", k_clusters=8)
    pq = pq_build(emb, "embedding", "vec_id")
    got = sorted(
        map(
            tuple,
            ivfpq_search(
                ivf, pq, emb, queries, "vec_id", k=4, nprobe=8,
                shortlist=10**9,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            knn_bruteforce(
                emb, queries, "embedding", "vec_id", "vec_id", k=4
            ).collect(),
        )
    )
    ivf.release()
    pq.release()
    assert got == want


def test_ivfpq_recall_at_realistic_knobs(spark, sf_dir):
    """Half the clusters probed, 13% shortlist: the composed pruning
    must still find most true neighbors (both error sources stack,
    so the bound is looser than flat PQ's)."""
    from odsc_agentic_ai_summit_2025_spark.operators.ivf import ivf_build
    from odsc_agentic_ai_summit_2025_spark.operators.pq import ivfpq_search

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    ivf = ivf_build(emb, "embedding", "vec_id", k_clusters=8)
    pq = pq_build(emb, "embedding", "vec_id")
    approx = {
        (r["q_id"], r["n_id"])
        for r in ivfpq_search(
            ivf, pq, emb, queries, "vec_id", k=3, nprobe=4, shortlist=64
        ).collect()
    }
    exact = {
        (r["q_id"], r["n_id"])
        for r in knn_bruteforce(
            emb, queries, "embedding", "vec_id", "vec_id", k=3
        ).collect()
    }
    ivf.release()
    pq.release()
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, f"ivfpq recall@3 = {recall:.2f}"


def test_pq_index_roundtrip_and_incremental(spark, sf_dir, tmp_path):
    """save→load preserves search results exactly; incremental add
    under frozen codebooks equals a full re-encode of the merged
    corpus (pq_encode is a pure per-row function)."""
    from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
        load_pq_index,
        pq_add_documents,
        save_pq_index,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.pq import pq_encode

    emb = _emb(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") < 5)

    idx = pq_build(old, "embedding", "vec_id")
    path = str(tmp_path / "pq_index")
    save_pq_index(idx, path)
    loaded = load_pq_index(spark, path)
    assert (loaded.codebooks == idx.codebooks).all()
    want = sorted(
        map(
            tuple,
            pq_search(idx, old, queries, "vec_id", k=3, shortlist=32).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            pq_search(
                loaded, old, queries, "vec_id", k=3, shortlist=32
            ).collect(),
        )
    )
    assert got == want

    # incremental: add the held-out rows (idempotently: old rows in
    # the add batch must be dropped) and compare against re-encoding
    # the full corpus under the same codebooks
    merged = pq_add_documents(idx, emb)  # emb includes already-known ids
    got_codes = {
        r["vec_id"]: list(r["code"]) for r in merged.codes.collect()
    }
    want_codes = {
        r["vec_id"]: list(r["code"])
        for r in pq_encode(emb, idx.codebooks, "embedding", "vec_id").collect()
    }
    assert got_codes == want_codes
    merged.release()
    idx.release()
