"""Index lifecycle: persist, load, and incrementally update the FTS,
IVF/PQ, and near-dup MinHash signature indexes.

The reference gets this from its embedded stores — LanceDB persists
the vector table (generate_note_embeddings.py:30-49) and Kuzu its FTS
index — and re-ingest is idempotent. Spark-first, an index IS a set
of DataFrames, so persistence is parquet with a layout chosen for the
read path:

- **FTS**: postings/doc-lengths/dfreq as parquet plus a one-row stats
  table. Serving reads only the probed terms' slices; the postings
  layout is term-major so predicate pushdown prunes row groups.
- **IVF**: centroids plus the assignment **partitioned by
  cluster_id** — the on-disk analog of the inverted lists, so a
  search with ``nprobe`` probes reads exactly ``nprobe`` partitions
  (partition pruning, no full scan).

Incremental update mirrors the reference's idempotent ingest:
already-indexed ids are dropped (anti-join on the id), new docs are
union-merged into the postings/lists. The IVF quantizer is FROZEN on
update — standard IVF practice (assignments stay consistent;
retraining is a rebuild, not an update) — so adds are one map-only
assignment pass over just the new rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fts import FtsIndex, Tokenizer, build_postings, doc_lengths, tokens
from .ivf import IvfIndex


# ---------------------------------------------------------------------------
# FTS
# ---------------------------------------------------------------------------


def save_fts_index(index: FtsIndex, path: str) -> None:
    index.postings.write.mode("overwrite").parquet(f"{path}/postings")
    index.dls.write.mode("overwrite").parquet(f"{path}/dls")
    index.dfreq.write.mode("overwrite").parquet(f"{path}/dfreq")
    spark = index.postings.sparkSession
    spark.createDataFrame(
        [(index.n_docs, float(index.avgdl))], "n_docs long, avgdl double"
    ).write.mode("overwrite").parquet(f"{path}/stats")


def load_fts_index(spark: SparkSession, path: str) -> FtsIndex:
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    return FtsIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        dls=spark.read.parquet(f"{path}/dls"),
        dfreq=spark.read.parquet(f"{path}/dfreq"),
        n_docs=stats["n_docs"],
        avgdl=stats["avgdl"],
    )


def fts_add_documents(
    index: FtsIndex,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    tokenizer: Tokenizer = tokens,
) -> FtsIndex:
    """Merge new documents into an FTS index (idempotent: ids already
    in the index are skipped, like the reference's re-ingest).

    Work is proportional to the NEW docs: their postings/lengths are
    built fresh; the merge is a union (doc ids are disjoint after the
    anti-join, so no tf re-aggregation) and dfreq is a union-sum over
    the new terms only. Use the SAME tokenizer as the build — mixed
    tokenization would split the term space.
    """
    fresh = new_docs.join(
        index.dls.select(F.col("doc").alias(id_col)), id_col, "left_anti"
    )
    p_new = build_postings(fresh, text_col, id_col, tokenizer)
    dl_new = doc_lengths(fresh, text_col, id_col, tokenizer)
    postings = index.postings.unionByName(p_new)
    dls = index.dls.unionByName(dl_new)
    df_new = p_new.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq = (
        index.dfreq.unionByName(df_new)
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    n_new, sum_new = (
        dl_new.agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
        ).collect()[0]
    )
    n_docs = index.n_docs + n_new
    avgdl = (index.avgdl * index.n_docs + sum_new) / max(n_docs, 1)
    return FtsIndex(postings, dls, dfreq, n_docs, avgdl)


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def save_ivf_index(index: IvfIndex, path: str) -> None:
    index.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    # inverted-list layout: one directory per cluster, so an
    # nprobe-probe search reads exactly nprobe partitions
    index.assigned.write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(f"{path}/assigned")
    spark = index.centroids.sparkSession
    spark.createDataFrame(
        [(index.vec_col, index.id_col)], "vec_col string, id_col string"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_ivf_index(spark: SparkSession, path: str) -> IvfIndex:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return IvfIndex(
        centroids=spark.read.parquet(f"{path}/centroids"),
        assigned=spark.read.parquet(f"{path}/assigned"),
        vec_col=meta["vec_col"],
        id_col=meta["id_col"],
    )


def ivf_add_documents(index: IvfIndex, new_corpus: DataFrame) -> IvfIndex:
    """Assign new vectors with the FROZEN quantizer and merge them
    into the inverted lists (idempotent on the id column). One
    map-only pass over the new rows — no retrain, no full-corpus
    touch; nprobe=K search remains exact over the merged corpus."""
    import numpy as np

    from pyspark.sql import types as T

    from ..sources.io import ensure_min_partitions

    fresh = new_corpus.join(
        index.assigned.select(index.id_col), index.id_col, "left_anti"
    )
    centers = np.stack(
        [
            np.asarray(r["centroid"], dtype=np.float64)
            for r in index.centroids.orderBy("cluster_id").collect()
        ]
    )
    bc = fresh.sparkSession.sparkContext.broadcast(centers)
    vec_col = index.vec_col

    def assign(batches):
        # Arrow-native decode + zero-copy pass-through (guide §4.2),
        # mirroring ivf_build's kernel exactly — same float64 math,
        # or incremental-add ≢ rebuild
        import numpy as np
        import pyarrow as pa

        from ..functions import arrowkit as ak

        cts = bc.value
        for b in batches:
            if b.num_rows == 0:
                continue
            m = ak.fixed_matrix(b.column(b.schema.get_field_index(vec_col)))
            m = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-300
            )
            scores = 2 * (m @ cts.T) - (cts * cts).sum(1)[None, :]
            yield b.append_column(
                "cluster_id",
                pa.array(scores.argmax(1).astype(np.int32)),
            )

    out_schema = T.StructType(
        list(new_corpus.schema.fields)
        + [T.StructField("cluster_id", T.IntegerType())]
    )
    added = ensure_min_partitions(fresh).mapInArrow(assign, out_schema)
    # persisted like ivf_build's assignment: an index is a long-lived
    # artifact whose cache the CALLER owns — unpersist the old index's
    # `assigned` when replacing it, or clearCache between builds
    merged = index.assigned.unionByName(added).persist()
    return IvfIndex(index.centroids, merged, index.vec_col, index.id_col)


# ---------------------------------------------------------------------------
# PQ
# ---------------------------------------------------------------------------


def save_pq_index(index, path: str) -> None:
    """Persist a PQ index: codes as parquet (THE artifact — ~10 bytes
    a row where the raw vectors were 512), codebooks as a tiny
    (subspace, codeword, center) table, and a meta row. Same layout
    philosophy as the IVF inverted lists: what the search scans is
    what the files contain."""
    import numpy as np  # noqa: F401

    spark = index.codes.sparkSession
    m, k, _ = index.codebooks.shape
    rows = [
        (j, c, [float(v) for v in index.codebooks[j][c]])
        for j in range(m)
        for c in range(k)
    ]
    spark.createDataFrame(
        rows, "subspace int, codeword int, center array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    index.codes.write.mode("overwrite").parquet(f"{path}/codes")
    spark.createDataFrame(
        [(index.vec_col, index.id_col, index.dim)],
        "vec_col string, id_col string, dim int",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_pq_index(spark: SparkSession, path: str):
    import numpy as np

    from .pq import PqIndex

    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = 1 + max(r["subspace"] for r in cb_rows)
    k = 1 + max(r["codeword"] for r in cb_rows)
    dsub = len(cb_rows[0]["center"])
    books = np.zeros((m, k, dsub))
    for r in cb_rows:
        books[r["subspace"], r["codeword"]] = np.asarray(r["center"])
    return PqIndex(
        codebooks=books,
        codes=spark.read.parquet(f"{path}/codes"),
        vec_col=meta["vec_col"],
        id_col=meta["id_col"],
        dim=meta["dim"],
    )





def pq_add_documents(index, new_corpus: DataFrame):
    """Encode new vectors under the FROZEN codebooks and merge
    (idempotent on the id column) — same update contract as IVF:
    quantizer retraining is a rebuild, not an update, so adds are one
    map-only pass over just the new rows, and the merged code table
    is provably identical to re-encoding the merged corpus
    (pq_encode is a pure per-row function of the codebooks)."""
    from .pq import PqIndex, pq_encode

    fresh = new_corpus.join(
        index.codes.select(index.id_col), index.id_col, "left_anti"
    )
    added = pq_encode(fresh, index.codebooks, index.vec_col, index.id_col)
    # persisted like pq_build's codes: the CALLER owns the index
    # lifetime (PqIndex.release) — release the old index when
    # replacing it
    merged = index.codes.unionByName(added).persist()
    return PqIndex(
        index.codebooks, merged, index.vec_col, index.id_col, index.dim
    )


# ---------------------------------------------------------------------------
# MinHash near-dup signature index (the standing ingest-gate index)
# ---------------------------------------------------------------------------


def save_neardup_index(index, path: str) -> None:
    """Persist the standing near-dup index: the signature table (the
    artifact — 16 int64 per doc, ~tens of GB at 100 TB of text) plus
    its band rows **partitioned by band_id**, so the admit gate's
    per-band probe reads exactly the bands it joins (partition
    pruning), and a meta row. Raw rows, no bucket trim — see
    build_neardup_index: trim counts must reflect the corpus at probe
    time for incremental add ≡ full rebuild to hold."""
    index.sigs.write.mode("overwrite").parquet(f"{path}/sigs")
    index.bands.write.mode("overwrite").partitionBy("band_id").parquet(
        f"{path}/bands"
    )
    spark = index.sigs.sparkSession
    # id type travels in the meta row: a partitionBy write of a
    # ZERO-row bands frame emits no part files, so the load must be
    # able to declare the schema instead of inferring it (day-0
    # bootstrap: build over an empty corpus, save, load, then admit
    # the first delivery)
    id_type = index.sigs.schema[index.id_col].dataType.simpleString()
    spark.createDataFrame(
        [(index.id_col, id_type)], "id_col string, id_type string"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_neardup_index(spark: SparkSession, path: str):
    from .dedup import NearDupIndex

    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    id_col, id_type = meta["id_col"], meta["id_type"]
    bands = spark.read.schema(
        f"{id_col} {id_type}, bucket_key string, band_id int"
    ).parquet(f"{path}/bands")
    return NearDupIndex(
        sigs=spark.read.schema(
            f"{id_col} {id_type}, sig array<long>"
        ).parquet(f"{path}/sigs"),
        # canonical column order (the build emits id, band_id,
        # bucket_key; the partition column reads back last)
        bands=bands.select(id_col, "band_id", "bucket_key"),
        id_col=id_col,
    )


def neardup_index_add(
    index, admitted_docs: DataFrame, text_col: str,
    *, admitted_sigs: "DataFrame | None" = None,
):
    """Extend the standing index with a delivery's ADMITTED docs —
    the close of the daily-ingest loop (VERDICT r10 #3): admit a
    delivery → append the admitted docs' signatures → the next
    delivery probes the extended index ≡ a full rebuild over
    corpus ∪ admitted (row-for-row; signatures and band rows are
    pure per-doc functions, so union IS rebuild). Idempotent on the
    id column like FTS/IVF/PQ adds: re-ingesting a delivery is a
    no-op. Work is proportional to the NEW docs — one text pass for
    their signatures, one map-only explode for their band rows; the
    standing corpus text is never re-read."""
    from .dedup import NearDupIndex, _sig_band_rows, minhash_signatures

    fresh = admitted_docs.join(
        index.sigs.select(index.id_col), index.id_col, "left_anti"
    )
    from ..cache import own

    # persisted like ivf_add_documents' merged lists: the delta feeds
    # BOTH the signature union and the band-row explode — unpinned,
    # the delivery's whole admit plan upstream of `admitted_docs`
    # re-ran per consumer (q112: 14.1 s -> ~7 s at sf0.1). The pin
    # rides BOTH returned frames as an own() handle, so a caller's
    # release() of either (or of an admit result built over them —
    # handles inherit transitively) frees the delta; the CALLER owns
    # the index lifetime.
    if admitted_sigs is None:
        new_sigs = minhash_signatures(fresh, text_col, index.id_col)
    else:
        # signatures computed at admission time (the admit gate
        # already ran one pass over the delivery) — restrict to the
        # fresh ids so idempotence on redelivery is preserved
        new_sigs = admitted_sigs.join(
            fresh.select(index.id_col), index.id_col
        )
    new_sigs = new_sigs.persist()
    delta_bands = _sig_band_rows(new_sigs, index.id_col)
    # delta_bands (a declared NearDupIndex field, None elsewhere) lets
    # a caller maintaining the MAX_BUCKET trim census across a chain
    # of admissions (q112) extend it with a delivery-sized delta
    # instead of rescanning the standing band table
    return NearDupIndex(
        sigs=own(index.sigs.unionByName(new_sigs), new_sigs),
        bands=own(index.bands.unionByName(delta_bands), new_sigs),
        id_col=index.id_col,
        delta_bands=own(delta_bands, new_sigs),
    )
