"""Deduplication query inventory — every tier oracle-checked, which
is possible because the hash math is explicit and engine-portable
(functions/text.py), not engine-internal."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import char_poly_hash_sql
from ..operators import dedup as ops
from ..operators import similarity as sim
from ..sources.io import read_table
from .registry import Query

_TOKS = "string_split_regex(text, '\\s+')"
_UTOKS = f"list_distinct({_TOKS})"
_HASHES = f"list_transform({_UTOKS}, t -> {char_poly_hash_sql('t')})"


def q34_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.exact_dedup_groups(
        read_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


Q34_SQL = """
SELECT sha256(text) AS text_sha, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents WHERE text IS NOT NULL GROUP BY 1
"""


def q35_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard ≥ 0.8 within the first 200 docs (bounded pair
    space at any SF; the LSH tier below is the unbounded-scale path)."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return ops.jaccard_pairs(docs, "text", "doc_id", threshold=0.8)


Q35_SQL = f"""
WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
toks AS (SELECT doc_id, unnest({_UTOKS}) AS tok FROM docs),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, n_inter, sa.n AS n_a, sb.n AS n_b,
       (n_inter * 10000) // (sa.n + sb.n - n_inter) AS jaccard_e4
FROM inter
JOIN sizes sa ON a_id = sa.doc_id
JOIN sizes sb ON b_id = sb.doc_id
WHERE (n_inter * 10000) // (sa.n + sb.n - n_inter) >= 8000
"""


def components_ctes(vertices_src: str, pairs_cte: str = "pairs") -> str:
    """The connected-components recursion as a reusable CTE chain —
    ``edges``/``reach``/``comp(id, cluster_id)`` over an (a_id, b_id)
    pair CTE and a vertex relation carrying ``doc_id``. Shared by the
    q66/q99/q100 oracles (same rationale as ``minhash_pairs_ctes``:
    one restated recursion would drift). The enclosing query must
    open with ``WITH RECURSIVE``."""
    return f"""edges AS (
  SELECT a_id AS src, b_id AS dst FROM {pairs_cte}
  UNION SELECT b_id, a_id FROM {pairs_cte}
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM {vertices_src}
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY 1)"""


def q66_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → transitive dedup clusters + keep/drop
    decisions (connected components over the q35 pair graph; docs
    with no near-dup become singleton clusters)."""
    from ..operators.components import connected_components, dedup_decisions

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ops.jaccard_pairs(docs, "text", "doc_id", threshold=0.8)
    comp = connected_components(
        pairs.select("a_id", "b_id"),
        vertices=docs.select(F.col("doc_id").alias("id")),
    )
    return dedup_decisions(comp).select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        "keep",
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )


# the q35 jaccard-pair CTEs over the bounded corpus, shared by the
# q66/q99 oracles (ends in pairs(a_id, b_id))
_JACCARD_PAIR_CTES = f"""docs AS (SELECT * FROM documents WHERE doc_id < 200),
toks AS (SELECT doc_id, unnest({_UTOKS}) AS tok FROM docs),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id
  FROM inter
  JOIN sizes sa ON a_id = sa.doc_id
  JOIN sizes sb ON b_id = sb.doc_id
  WHERE (n_inter * 10000) // (sa.n + sb.n - n_inter) >= 8000
)"""

Q66_SQL = f"""
WITH RECURSIVE {_JACCARD_PAIR_CTES},
{components_ctes('docs')}
SELECT id AS doc_id,
       cluster_id,
       id = MIN(id) OVER (PARTITION BY cluster_id) AS keep,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS INT) AS cluster_size
FROM comp
"""


def q99_quality_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup survivor selection by QUALITY: near-dup pairs →
    components → per cluster keep the argmax-(quality_e4, min id)
    document — the policy real pipelines want (keep the cleanest
    near-duplicate, not the first-by-id; q66 is the min-id variant).
    Composes three oracled tiers: q35 pairs, q66 components, q31
    quality."""
    from ..operators import textops as tops
    from ..operators.components import (
        connected_components,
        quality_representatives,
    )

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ops.jaccard_pairs(docs, "text", "doc_id", threshold=0.8)
    comp = connected_components(
        pairs.select("a_id", "b_id"),
        vertices=docs.select(F.col("doc_id").alias("id")),
    )
    quality = tops.quality_score(docs, "text", "doc_id").select(
        F.col("doc_id").alias("id"), "quality_e4"
    )
    return quality_representatives(comp, quality).select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        "quality_e4",
        "keep",
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )


def _q99_sql() -> str:
    from .textops import quality_ctes

    return f"""
WITH RECURSIVE {_JACCARD_PAIR_CTES},
{components_ctes('docs')},
{quality_ctes('docs')}
SELECT c.id AS doc_id, c.cluster_id, q.quality_e4,
       c.id = FIRST_VALUE(c.id) OVER (
           PARTITION BY c.cluster_id ORDER BY q.quality_e4 DESC, c.id ASC
       ) AS keep,
       CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS INT) AS cluster_size
FROM comp c JOIN quality q ON q.doc_id = c.id
"""


def q36_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.minhash_candidate_pairs(
        read_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def minhash_pairs_ctes(src: str) -> str:
    """The MinHash-LSH candidate-pair machinery as a reusable CTE
    chain over relation ``src`` (needs ``doc_id, text``), ending in
    ``mh_pairs(a_id, b_id, n_shared_bands)``. Shared by the q36
    oracle and the q100 end-to-end pipeline oracle — one restated
    copy of the signature/banding constants would drift."""
    p = ops.MINHASH_P
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {p}))"
        for (a, b) in ops.MINHASH_PARAMS
    )
    band_cases = " ".join(
        f"WHEN {band} THEN concat_ws('_', "
        + ", ".join(f"sig[{band * ops.ROWS_PER_BAND + i + 1}]" for i in range(ops.ROWS_PER_BAND))
        + ")"
        for band in range(ops.N_BANDS)
    )
    band_ids = ", ".join(f"({b})" for b in range(ops.N_BANDS))
    return f"""mh_toks AS (SELECT doc_id, {_HASHES} AS hs FROM {src}
              WHERE text IS NOT NULL),
mh_sigs AS (SELECT doc_id, [{sig_exprs}] AS sig FROM mh_toks),
mh_bands AS (
  SELECT doc_id, band_id,
         CASE band_id {band_cases} END AS bucket_key
  FROM mh_sigs, (VALUES {band_ids}) AS b(band_id)
),
mh_small AS (
  SELECT band_id, bucket_key FROM mh_bands
  GROUP BY 1, 2 HAVING COUNT(*) <= {ops.MAX_BUCKET}
),
mh_kept AS (SELECT mh_bands.* FROM mh_bands
            JOIN mh_small USING (band_id, bucket_key)),
mh_pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared_bands
  FROM mh_kept a
  JOIN mh_kept b ON a.band_id = b.band_id AND a.bucket_key = b.bucket_key
                AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


def _minhash_sql() -> str:
    return f"""
WITH {minhash_pairs_ctes('documents')}
SELECT a_id, b_id, n_shared_bands FROM mh_pairs
"""


def q37_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return ops.simhash_table(docs, "text", "simhash").select(
        "doc_id", "simhash"
    )


def _simhash_votes_expr() -> str:
    """The bit-vote fold over a token-hash list column ``hs`` —
    shared by every simhash oracle (q37/q78 over ``documents``, q89
    over the canonicalized CTE)."""
    votes = []
    for b in range(ops.SIMHASH_BITS):
        vote = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)), (a, b) -> a + b)"
        )
        votes.append(f"(CASE WHEN {vote} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)")
    return " + ".join(votes)


def _simhash_sql(src: str = "documents") -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_HASHES} AS hs FROM {src}
              WHERE text IS NOT NULL)
SELECT doc_id, {_simhash_votes_expr()} AS simhash FROM toks
"""


def q78_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 near-dup pairs via lossless pigeonhole
    banding (operators/dedup.py:simhash_near_pairs) — the pair
    generator the q37 fingerprints exist for. The oracle is the
    brute-force all-pairs popcount program; the banded plan must
    reproduce it exactly."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return ops.simhash_near_pairs(docs, "text", "doc_id", max_hamming=3)


def _q78_sql() -> str:
    return f"""
WITH s AS ({_simhash_sql()})
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q38_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim.embedding_neardup_pairs(emb, "embedding", "vec_id", threshold=0.45)


Q38_SQL = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
"""


def q63_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup over hash-embedded documents — the 100 TB
    approximate path with exact verification. 32 tables × 8 planes:
    the mean-centering step (which keeps cone-shaped corpora
    bucketable at all) hashes in CENTERED space while the 0.95 gate
    verifies RAW cosine, so the textbook recall formula understates
    misses near the threshold — 16 tables dropped 11/350 sf0.1 pairs
    (all raw-cos 0.950-0.954); 32 gives deterministic full recall on
    both gate corpora (sf0.01 and sf0.1, probed r3). In general
    recall is 1-(1-p^r)^b and the operator is documented
    approximate."""
    from ..functions.embedder import embed

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    vecs = embed(docs, "text", "vector", dim=64).select("doc_id", "vector")
    # planes_per_table pinned: the operator's adaptive default grows r
    # with corpus size (r = ceil(log2(n/32))), which trades recall for
    # candidate count — right for the approximate tier, wrong for this
    # gate plan, whose full-recall probe (32 tables × 8 planes) must
    # hold at ANY corpus size, not just the SFs where the formula
    # happens to yield 8.
    return sim.neardup_pairs_lsh(
        vecs, "vector", "doc_id", threshold=0.95, n_tables=32,
        planes_per_table=8,
    )


def _q63_sql() -> str:
    from ..functions.embedder import embed_sql_vector_cte

    return f"""
WITH {embed_sql_vector_cte()},
pairs AS (
  SELECT a.id AS a_id, b.id AS b_id, SUM(a.w * b.w) AS cos
  FROM vec a JOIN vec b ON a.b = b.b AND a.id < b.id
  GROUP BY 1, 2)
SELECT a_id, b_id FROM pairs WHERE cos >= 0.95
"""


def q82_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) end-to-end — kNN self-join →
    thresholded edges → connected components → min-id keep decisions —
    in the EXACT configuration: nprobe=k_clusters probes every
    cluster, and k=10 exceeds the max cosine-degree at threshold 0.45
    on both gate corpora (1 at sf0.01, 3 at sf0.1), so the thresholded
    kNN graph is precisely the full >=0.45 pair graph and the oracle
    is the Q38 cosine join composed with the Q66 recursive-CTE
    components + decisions. Gate corpus bounded to the first 1000
    vectors (the q81 pattern: the exact nprobe=K configuration scores
    every pair, so GATE cost must not scale with SF; the
    sub-quadratic partial-probe composition is the scale path and is
    what `pipeline.semantic_dedup` runs by default)."""
    from ..pipeline import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 1000
    )
    return semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.45,
        k_neighbors=10, k_clusters=8, nprobe=8,
    ).select(
        F.col("id").alias("vec_id"),
        "cluster_id",
        "keep",
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )


Q82_SQL = """
WITH RECURSIVE emb AS (SELECT * FROM embeddings WHERE vec_id < 1000),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.45
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
reach(id, r) AS (
  SELECT vec_id, vec_id FROM emb
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY 1)
SELECT id AS vec_id,
       cluster_id,
       id = MIN(id) OVER (PARTITION BY cluster_id) AS keep,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS INT) AS cluster_size
FROM comp
"""


QUERIES = [
    Query("q82_semantic_dedup", q82_semantic_dedup, Q82_SQL,
          ("V2", "U2", "A2"),
          "SemDeDup: kNN-join edges → components → keep decisions"),
    Query("q34_dedup_exact", q34_dedup_exact, Q34_SQL,
          ("A1", "A2"), "exact dedup via sha256 groupBy"),
    Query("q35_jaccard_pairs", q35_jaccard_pairs, Q35_SQL,
          ("U2",), "token-set Jaccard near-dup pairs"),
    Query("q36_minhash_lsh", q36_minhash_lsh, _minhash_sql(),
          ("V2",), "MinHash+LSH candidate pairs"),
    Query("q37_simhash", q37_simhash, _simhash_sql(),
          ("V2",), "SimHash fingerprints"),
    Query("q78_simhash_pairs", q78_simhash_pairs, _q78_sql(),
          ("V2", "U2"), "SimHash Hamming-near pairs (pigeonhole banding)"),
    Query("q38_embedding_neardup", q38_embedding_neardup, Q38_SQL,
          ("V2", "O2"), "embedding cosine near-dup pairs"),
    Query("q66_dedup_clusters", q66_dedup_clusters, Q66_SQL,
          ("U2", "A2"), "connected-component dedup clusters + keep/drop"),
    Query("q99_quality_reps", q99_quality_reps, _q99_sql(),
          ("U2", "A7"), "quality-argmax survivor selection per dedup cluster"),
    Query("q63_neardup_lsh", q63_neardup_lsh, _q63_sql(),
          ("V2", "V1"), "banded-LSH near-dup with exact verification"),
]


_CANON = (
    "trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9 \\t\\n\\r]', ' ', 'g'), '[ \\t\\n\\r]+', ' ', 'g'))"
)


def q89_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-candidate → exact-Levenshtein near-dup pairs over
    canonicalized text (first 120 docs, Hamming ≤ 4 — the exact
    verify is O(len²)/pair, so the GATE corpus and candidate radius
    are pinned; the oracle is brute-force all-pairs)."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    # distance budget ~half the typical canonical doc length: the
    # near-dup regime for this corpus (its closest non-identical pairs
    # sit at lev 40-90), so the gate result is non-degenerate at
    # every SF while the hamming-4 candidate radius keeps the
    # O(len²) verify off the vast majority of pairs
    return ops.editdist_near_pairs(
        docs, "text", "doc_id", max_hamming=4, max_dist=120
    )


def _q89_sql() -> str:
    return f"""
WITH norm AS (
  SELECT doc_id, {_CANON} AS text
  FROM documents WHERE text IS NOT NULL AND doc_id < 120
),
toks AS (SELECT doc_id, {_HASHES} AS hs FROM norm),
s AS (SELECT doc_id, {_simhash_votes_expr()} AS simhash FROM toks)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming,
       CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
FROM norm a
JOIN norm b ON a.doc_id < b.doc_id
JOIN s sa ON sa.doc_id = a.doc_id
JOIN s sb ON sb.doc_id = b.doc_id
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 4
  AND levenshtein(a.text, b.text) <= 120
"""


QUERIES.insert(
    1,  # zero-history: must sit inside the 50-entry gate window
    Query("q89_editdist_pairs", q89_editdist_pairs, _q89_sql(),
          ("U2", "F2"), "simhash-candidate exact-Levenshtein near-dup pairs"),
)


_PAIRS05 = f"""
docs AS (SELECT * FROM documents WHERE doc_id < 200),
toks AS (SELECT doc_id, unnest({_UTOKS}) AS tok FROM docs),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id
  FROM inter
  JOIN sizes sa ON a_id = sa.doc_id
  JOIN sizes sb ON b_id = sb.doc_id
  WHERE (n_inter * 10000) // (sa.n + sb.n - n_inter) >= 5000
)"""


def _neardup_graph(spark: SparkSession, sf_dir: str):
    """The gate graph both analytics queries run on: Jaccard ≥ 0.5
    pairs within the first 200 docs (denser than q66's 0.8 graph so
    triangles exist), plus every doc as a vertex."""
    from ..cache import own

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    jp = ops.jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    # re-attach the generator's prefix cache to the stripped edge list
    # so the analytics result's release reaches it
    pairs = own(jp.select("a_id", "b_id"), jp)
    return pairs, docs.select(F.col("doc_id").alias("id"))


def q90_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the near-dup graph — the
    clustering-coefficient numerator via the ordered three-way join
    (each triangle enumerated once as a < b < c)."""
    from ..operators.components import triangle_counts

    pairs, verts = _neardup_graph(spark, sf_dir)
    return triangle_counts(pairs, verts).select(
        F.col("id").alias("doc_id"), "n_triangles"
    )


Q90_SQL = f"""
WITH {_PAIRS05},
tri AS (
  SELECT p1.a_id AS a, p1.b_id AS b, p2.b_id AS c
  FROM pairs p1
  JOIN pairs p2 ON p2.a_id = p1.b_id
  JOIN pairs p3 ON p3.a_id = p1.a_id AND p3.b_id = p2.b_id
),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, COUNT(*) AS n FROM corners GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_triangles
FROM docs d LEFT JOIN cnt ON cnt.id = d.doc_id
"""


def q91_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank (3 unrolled power steps, e9 fixed
    point) over the symmetric near-dup graph — an oracle-checkable
    PageRank, which float implementations can never be."""
    from ..operators.components import pagerank_fixed

    pairs, verts = _neardup_graph(spark, sf_dir)
    return pagerank_fixed(pairs, verts, iterations=3).select(
        F.col("id").alias("doc_id"), "pr_e9"
    )


def _q91_iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT v.id,
         CAST((15 * (1000000000 // n.n)) // 100
              + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr_e9
  FROM verts v CROSS JOIN n
  LEFT JOIN (
    SELECT sym.dst AS id, SUM(p.pr_e9 // d.deg) AS s
    FROM sym
    JOIN {prev} p ON p.id = sym.src
    JOIN deg d ON d.src = sym.src
    GROUP BY 1
  ) c ON c.id = v.id
)"""


Q91_SQL = f"""
WITH {_PAIRS05},
sym AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
),
verts AS (SELECT doc_id AS id FROM docs),
n AS (SELECT COUNT(*) AS n FROM verts),
deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY 1),
pr0 AS (
  SELECT v.id, CAST(1000000000 // n.n AS BIGINT) AS pr_e9
  FROM verts v CROSS JOIN n
),{_q91_iter_sql("pr0", "pr1")},{_q91_iter_sql("pr1", "pr2")},{_q91_iter_sql("pr2", "pr3")}
SELECT id AS doc_id, pr_e9 FROM pr3
"""


QUERIES.insert(
    2,
    Query("q90_triangle_counts", q90_triangle_counts, Q90_SQL,
          ("J3", "A5"), "per-vertex triangle counts (ordered 3-way join)"),
)
QUERIES.insert(
    3,
    Query("q91_pagerank", q91_pagerank, Q91_SQL,
          ("J3", "A5"), "exact-integer fixed-point PageRank (3 steps)"),
)


# ---------------------------------------------------------------------------
# q111 — incremental NEAR-dup admission (r10 TAIL): the fuzzy twin of
# q86's exact admit gate, and the operation a production ingest
# pipeline actually runs at 100 TB — a new delivery (doc_id % 3 == 0)
# probed against the STANDING MinHash signature index of the corpus
# (doc_id % 3 != 0) through the q36 band buckets, verified by
# signature agreement, without re-reading or re-pairing the corpus.
# The oracle replays the pinned decision rule (null_text /
# near_corpus / dup_in_batch-smaller-id / new) from the same
# signature constants, so a hash match pins blocking, verification,
# and the admission convention end to end.
# ---------------------------------------------------------------------------

# one constant feeds the Spark callable AND the SQL twin, so a
# non-default threshold cannot run oracle-unchecked (ADVICE r10)
_Q111_MIN_AGREE_E4 = 5000


def q111_neardup_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    sigs = ops.minhash_signatures(existing, "text", "doc_id")
    return ops.neardup_admit_incremental(
        sigs, new, "text", "doc_id", min_agree_e4=_Q111_MIN_AGREE_E4
    )


def _sig_cte_exprs() -> str:
    p = ops.MINHASH_P
    return ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {p}))"
        for (a, b) in ops.MINHASH_PARAMS
    )


def _band_rows_sql(sig_src: str) -> str:
    """sig table -> (doc_id, band_id, bucket_key) rows, same key
    rendering as the Spark side (DuckDB lists are 1-based)."""
    band_cases = " ".join(
        f"WHEN {band} THEN concat_ws('_', "
        + ", ".join(
            f"sig[{band * ops.ROWS_PER_BAND + i + 1}]"
            for i in range(ops.ROWS_PER_BAND)
        )
        + ")"
        for band in range(ops.N_BANDS)
    )
    band_ids = ", ".join(f"({b})" for b in range(ops.N_BANDS))
    return (
        f"SELECT doc_id, band_id, CASE band_id {band_cases} END AS bucket_key"
        f" FROM {sig_src}, (VALUES {band_ids}) AS b(band_id)"
    )


def _admit_ctes(p: str, ex_src: str, nw_src: str, min_agree_e4: int) -> str:
    """One incremental near-dup admission (the pinned q111 decision
    rule) as a ``p``-prefixed CTE chain ending in
    ``{p}decided(doc_id, admitted, reason, n_corpus_matches)`` —
    composable, so q112 chains TWO admissions (with an index extend
    between them) inside one WITH clause."""
    agree = (
        f"list_sum(list_transform(range(1, {ops.N_HASH} + 1), "
        f"i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END))"
    )
    thresh = f"{agree} * 10000 // {ops.N_HASH} >= {min_agree_e4}"
    return f"""
{p}ex AS ({ex_src}),
{p}nw AS ({nw_src}),
{p}ex_toks AS (SELECT doc_id, {_HASHES} AS hs FROM {p}ex
               WHERE text IS NOT NULL),
{p}ex_sigs AS (SELECT doc_id, [{_sig_cte_exprs()}] AS sig FROM {p}ex_toks
            WHERE len(hs) > 0),
{p}nw_toks AS (SELECT doc_id, {_HASHES} AS hs FROM {p}nw
               WHERE text IS NOT NULL),
{p}nw_sigs AS (SELECT doc_id, [{_sig_cte_exprs()}] AS sig FROM {p}nw_toks
            WHERE len(hs) > 0),
{p}ex_bands AS ({_band_rows_sql(p + 'ex_sigs')}),
{p}ex_kept AS (
  SELECT eb.* FROM {p}ex_bands eb
  JOIN (SELECT band_id, bucket_key FROM {p}ex_bands
        GROUP BY 1, 2 HAVING COUNT(*) <= {ops.MAX_BUCKET}) s
  USING (band_id, bucket_key)
),
{p}nw_bands AS ({_band_rows_sql(p + 'nw_sigs')}),
{p}nw_kept AS (
  SELECT nb.* FROM {p}nw_bands nb
  JOIN (SELECT band_id, bucket_key FROM {p}nw_bands
        GROUP BY 1, 2 HAVING COUNT(*) <= {ops.MAX_BUCKET}) s
  USING (band_id, bucket_key)
),
{p}corpus_cand AS (
  SELECT DISTINCT n.doc_id AS new_id, e.doc_id AS old_id
  FROM {p}nw_bands n JOIN {p}ex_kept e USING (band_id, bucket_key)
),
{p}corpus_hits AS (
  SELECT new_id, COUNT(*) AS n_corpus_matches
  FROM (
    SELECT c.new_id, ns.sig AS sa, es.sig AS sb
    FROM {p}corpus_cand c
    JOIN {p}nw_sigs ns ON ns.doc_id = c.new_id
    JOIN {p}ex_sigs es ON es.doc_id = c.old_id
  )
  WHERE {thresh}
  GROUP BY 1
),
{p}batch_cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM {p}nw_kept a
  JOIN {p}nw_kept b ON a.band_id = b.band_id
                AND a.bucket_key = b.bucket_key
                AND a.doc_id < b.doc_id
),
{p}batch_dups AS (
  SELECT DISTINCT b_id FROM (
    SELECT c.b_id, sa.sig AS sa, sb.sig AS sb
    FROM {p}batch_cand c
    JOIN {p}nw_sigs sa ON sa.doc_id = c.a_id
    JOIN {p}nw_sigs sb ON sb.doc_id = c.b_id
  )
  WHERE {thresh}
),
{p}decided AS (
  SELECT nw.doc_id,
       CASE WHEN nw.text IS NULL THEN FALSE
            WHEN ch.new_id IS NOT NULL THEN FALSE
            WHEN bd.b_id IS NOT NULL THEN FALSE
            ELSE TRUE END AS admitted,
       CASE WHEN nw.text IS NULL THEN 'null_text'
            WHEN ch.new_id IS NOT NULL THEN 'near_corpus'
            WHEN bd.b_id IS NOT NULL THEN 'dup_in_batch'
            ELSE 'new' END AS reason,
       CAST(COALESCE(ch.n_corpus_matches, 0) AS BIGINT) AS n_corpus_matches
  FROM {p}nw nw
  LEFT JOIN {p}corpus_hits ch ON ch.new_id = nw.doc_id
  LEFT JOIN {p}batch_dups bd ON bd.b_id = nw.doc_id
)"""


def _q111_sql(min_agree_e4: int = _Q111_MIN_AGREE_E4) -> str:
    ctes = _admit_ctes(
        "",
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0",
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0",
        min_agree_e4,
    )
    return f"""
WITH {ctes}
SELECT doc_id, admitted, reason, n_corpus_matches FROM decided
"""


# ---------------------------------------------------------------------------
# q112 — standing-index LIFECYCLE, surfaced as a query (VERDICT r10
# #3): build the index on corpus slice 1, admit delivery A, APPEND
# the admitted docs' signatures/bands (operators/index_io.py:
# neardup_index_add — work proportional to the delivery, corpus text
# never re-read), then admit delivery B against the EXTENDED index.
# The oracle replays both admissions with a FULL REBUILD between
# them, so a hash match proves incremental add ≡ rebuild end to end
# — the q86 exact-gate precedent, fuzzed.
# ---------------------------------------------------------------------------

def q112_neardup_index_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.index_io import neardup_index_add

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 == 1)
    delivery_a = docs.filter(F.col("doc_id") % 3 == 2)
    delivery_b = docs.filter(F.col("doc_id") % 3 == 0)
    # ONE signature pass over the whole table, shared by the corpus
    # build, both deliveries' admissions, and the index extend — the
    # lifecycle replays three slices of the SAME parquet, so four
    # separate mapInPandas passes (corpus, delivery A, delta,
    # delivery B) were pure repeated cost: each respun Python workers
    # and rescanned the text (profiled r12 — the slices' signature
    # stages, not the join tree, dominated the cold run). In
    # production the per-delivery signatures arrive precomputed from
    # the ingest path; this is that shape.
    # EAGER localCheckpoint, not persist (r14, guide §5/§7.3 — large
    # query plans are driver-side cost): every downstream frame of the
    # chained lifecycle embeds this table's plan; as a persist, each
    # InMemoryTableScan prints/analyzes the whole mapInArrow subtree
    # and the final two-admission plan reached ~210 KB of operator
    # tree — ~5 s of pure Catalyst analysis (0 jobs) before the first
    # task launched. The checkpoint swaps it for a flat scan of
    # already-computed blocks (same executor-resident storage class
    # the persist used; released by the same own() handle below), and
    # the signature kernel provably runs exactly once.
    all_sigs = ops.minhash_signatures(docs, "text", "doc_id").localCheckpoint(
        eager=True
    )
    idx = ops.build_neardup_index(
        corpus, "text", "doc_id",
        sigs=all_sigs.filter(F.col("doc_id") % 3 == 1),
    )
    # the standing band table feeds the trim + probe in each admit;
    # caller-owned pin — bench's per-query sweep releases it
    idx.bands = idx.bands.persist()
    # the MAX_BUCKET trim census is maintained ACROSS the chain
    # (VERDICT r11 #3): computed once over the standing bands, then
    # extended with the delivery-sized delta after the append —
    # the corpus band table is never re-censused per admission
    census_1 = ops.neardup_bucket_census(idx.bands).persist()
    sigs_a = all_sigs.filter(F.col("doc_id") % 3 == 2)
    admit_a = ops.neardup_admit_incremental(
        idx.sigs, delivery_a, "text", "doc_id",
        min_agree_e4=_Q111_MIN_AGREE_E4,
        existing_kept=ops.neardup_trimmed(idx.bands, census_1),
        new_sigs=sigs_a,
    )
    # the SECOND admission's plan otherwise embeds the ENTIRE first
    # admission (admitted ids feed the index extend feed the probe) —
    # the other half of the ~210 KB analyzed-plan blowup. The decision
    # table is delivery-sized ([id, admitted, reason, n]), so an eager
    # checkpoint is broadcast-class storage; own() keeps admit A's
    # internal pins releasable through the checkpointed frame.
    from ..cache import own
    admit_a = own(admit_a.localCheckpoint(eager=True), admit_a)
    admitted_a = delivery_a.join(
        admit_a.filter(F.col("admitted")).select("doc_id"), "doc_id"
    )
    idx2 = neardup_index_add(idx, admitted_a, "text", admitted_sigs=sigs_a)
    idx2.bands = idx2.bands.persist()
    census_2 = (
        census_1.unionByName(ops.neardup_bucket_census(idx2.delta_bands))
        .groupBy("band_id", "bucket_key")
        .agg(F.sum("_n").alias("_n"))
    )
    final = ops.neardup_admit_incremental(
        idx2.sigs, delivery_b, "text", "doc_id",
        min_agree_e4=_Q111_MIN_AGREE_E4,
        existing_kept=ops.neardup_trimmed(idx2.bands, census_2),
        new_sigs=all_sigs.filter(F.col("doc_id") % 3 == 0),
    )
    # everything this query pinned rides the result: the signature,
    # band, and census pins directly, admit A's internal pins via its
    # result frame, and the add's signature delta via idx2.bands'
    # inherited handle — release(result) (or bench's sweep) frees
    # the lot
    from ..cache import own

    return own(
        final, admit_a, all_sigs, idx.bands, idx2.bands, census_1,
        idx2.delta_bands,
    )


def _q112_sql(min_agree_e4: int = _Q111_MIN_AGREE_E4) -> str:
    first = _admit_ctes(
        "a_",
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1",
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2",
        min_agree_e4,
    )
    second = _admit_ctes(
        "b_",
        # full rebuild over corpus ∪ admitted-A — what the Spark
        # side's incremental append must be row-for-row equal to
        "SELECT doc_id, text FROM ex2",
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0",
        min_agree_e4,
    )
    return f"""
WITH {first},
ex2 AS (
  SELECT doc_id, text FROM a_ex
  UNION ALL
  SELECT nw.doc_id, nw.text FROM a_nw nw
  JOIN a_decided d ON d.doc_id = nw.doc_id
  WHERE d.admitted
),
{second}
SELECT doc_id, admitted, reason, n_corpus_matches FROM b_decided
"""


# r10/r11 TAIL additions (outside the 50-entry gate window; q111 is
# pinned in the r11 window, q112 enters with the r12 rotation note in
# registry.py).
TAIL_QUERIES = [
    Query("q111_neardup_admit", q111_neardup_admit, _q111_sql(),
          ("A2", "J1"),
          "incremental near-dup admission against a standing MinHash index"),
    Query("q112_neardup_index_lifecycle", q112_neardup_index_lifecycle,
          _q112_sql(), ("A2", "J1"),
          "standing MinHash index lifecycle: admit -> append -> admit "
          "== full rebuild"),
]
