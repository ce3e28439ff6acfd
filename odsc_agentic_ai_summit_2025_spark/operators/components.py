"""Connected components over duplicate-pair edges (dedup clustering).

Pair generators (exact sha groups, Jaccard, MinHash-LSH, embedding
near-dup) emit EDGES; deduplication needs the transitive CLUSTERS —
"keep one document per component". This is the step between "found
339 near-dup pairs" and an actual keep/drop decision list.

Two algorithms, one contract ([id, cluster_id] with cluster_id = the
minimum id reachable from id):

- **min-label propagation + pointer jumping** (default): each round
  is two joins + one aggregation keyed by vertex id; the jump
  (label ← label(label)) gives O(log diameter) convergence. Right
  for dedup-cluster topology (many small components). Its weakness:
  a GIANT component makes the pointer-jump join hot on the
  component-minimum label — every member probes the same key.
- **large-star/small-star** (Kiveris et al., "Connected Components
  in MapReduce and Beyond"): alternating rounds that re-point edges
  at per-NODE minima — every shuffle key is a vertex id with the
  graph's own degree distribution, never a component label, so a
  giant component has no hot key beyond its (AQE-splittable) hub
  degrees. O(log² n) rounds worst case; the scale fallback.

``algorithm="auto"`` runs min-label and falls back to star when the
iteration budget is exhausted instead of raising — the budget being
exceeded IS the signal that the topology wants the star variant.

Every round localCheckpoints its frame (lineage truncation — an
uncut plan tree doubles per iteration and the driver OOMs on plan
analysis long before data is a problem) and RELEASES the previous
round's blocks once the new round is materialized, so a session
running many clusterings holds at most two rounds of label storage
at any time (round-4; closes the r3 residue item).

Determinism: labels are ids and every step is a min — the fixpoint
is the component-minimum id regardless of partitioning or round
interleaving, so the output is oracle-checkable (DuckDB recursive
CTE computes the same min-reachable-id closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import own, release_frame


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iterations: int = 25,
    algorithm: str = "auto",
    driver_max_edges: int | None = None,
) -> DataFrame:
    """[a, b] edge pairs → [id, cluster_id] with cluster_id = the
    minimum id reachable from ``id``.

    ``vertices`` (optional, one ``id_col`` column) adds isolated
    nodes — they come back as their own singleton clusters.
    ``algorithm``: ``"minlabel"`` (raises if not converged within
    ``max_iterations``), ``"star"`` (large-star/small-star from the
    start), or ``"auto"`` (min-label, star fallback on budget
    exhaustion). The returned frame carries its backing checkpoint
    via :mod:`..cache` — call ``cache.release(result)`` after the
    consuming action in long-lived sessions.

    ``driver_max_edges`` (``auto`` only; default from
    ``SPARK_GRAFT_CC_DRIVER_MAX_EDGES``, 0 disables): when the
    DISTINCT symmetric edge set fits under this bound, the component
    labels are solved on the driver in one vectorized numpy pass over
    the collected edge list instead of the iterative join loop — the
    same decision a planner makes when it broadcasts a small join
    side (guide §1.2: choose the algorithm by the data). The dedup
    graphs this operator sees are post-shuffle CANDIDATE graphs —
    bounded by banding/trim guards, orders of magnitude smaller than
    the corpus — so even at 100 TB they are usually driver-sized;
    each fixpoint round otherwise costs 2-3 job barriers whose
    driver-side latency dominates at any scale (measured r13: q66
    wall 4.1 s vs 2.3 s of job time across 49 jobs). Labels are the
    identical component-minimum ids (property-tested against the
    distributed loop), the edge list is evaluated exactly once (the
    same persist the loop uses), and graphs over the bound take the
    loop unchanged.
    """
    if algorithm not in ("auto", "minlabel", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    # symmetrize with ONE scan of `pairs` (explode both orientations
    # per row), not a self-union: the pair list is usually an
    # UNPERSISTED generator (the MinHash bucket join, a Jaccard
    # prefix-filter join), and a union's two legs re-run it twice
    # during the edge persist's first materialization (r8 profile:
    # the second scan was ~40% of the composed q100 pipeline's
    # components phase)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
    )
    nodes = edges.select(F.col("src").alias(id_col)).distinct()
    if vertices is not None:
        nodes = nodes.unionByName(
            vertices.select(F.col(id_col))
        ).distinct()
    if algorithm == "star":
        return own(
            _star_components(edges, nodes, id_col, max_iterations), pairs
        )
    edges = edges.persist()
    if driver_max_edges is None:
        import os

        driver_max_edges = int(
            os.environ.get("SPARK_GRAFT_CC_DRIVER_MAX_EDGES", "4000000")
        )
    if algorithm == "auto" and driver_max_edges > 0:
        # the count materializes the same persist the loop would (the
        # generator runs exactly once either way); the collect below
        # then reads cached blocks
        if edges.count() <= driver_max_edges:
            out = _driver_components(edges, nodes, id_col)
            # the edge cache backs the output plan's `nodes` scan —
            # it rides the result and frees with cache.release
            return own(out, edges, pairs)
    # lazy checkpoint: the convergence-sum collect below is the
    # materializing action — 1 job for init, not 2
    labels = nodes.withColumn(
        "cluster_id", F.col(id_col)
    ).localCheckpoint(eager=False)

    def _label_sum(frame: DataFrame):
        # labels only ever decrease, so the exact decimal sum is a
        # strictly-decreasing convergence witness — no compare join.
        # COUNT rides along for free: it sizes the loop's shuffle
        # partitioning below without an extra job.
        row = frame.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return row["s"], row["n"]

    prev_sum, n_nodes = _label_sum(labels)
    converged = False
    # Scale-adaptive loop partitioning (optimization guide §2.2/§2.4:
    # derive partition counts from input size, not a constant). Every
    # round is 2-3 shuffles of an (id, label) long-pair table keyed by
    # vertex id; under the session's fixed shuffle.partitions (=cpus,
    # kept by the deliberate parallelismFirst=true default) a tiny
    # dedup graph pays ~32 tasks × ~10 ms of pure scheduling per
    # stage, ~0.35 s per checkpointed round (q100 stage trace, r13).
    # 250k vertices per partition keeps reduce partitions in the
    # tens-of-MB class; big graphs hit the defaultParallelism cap and
    # behave exactly as before. Hash partition count cannot change a
    # min fixpoint, so results are untouched. Restored in the finally.
    sess = labels.sparkSession
    _orig_parts = sess.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(
        1,
        min(
            sess.sparkContext.defaultParallelism,
            -(-int(n_nodes or 0) // 250_000),
        ),
    )
    # try/finally: the persisted edge table must not outlive the loop
    # even when the fixpoint check raises (or any round fails), and
    # the session's shuffle partitioning must be restored on any exit
    try:
        sess.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        # The cached edge table and the init label table inherited the
        # SESSION's partitioning (the candidate generator's reduce
        # outputs — cpus partitions); every round's map stage re-scans
        # them, and since .rdd conversion executes AQE stages eagerly
        # in Spark 4.1, each round paid a ~cpus-task map stage
        # (~0.3 s wall at gate scale, q100 trace) just to read a few
        # KB of cached blocks. A plan-level coalesce to loop_parts
        # reads the SAME cached blocks (no second copy) with
        # loop_parts tasks; skipped at scale, where loop_parts ==
        # defaultParallelism and the real split must stay.
        labels_store = labels  # the checkpointed frame releases target
        edges_scan = edges
        if loop_parts < sess.sparkContext.defaultParallelism:
            edges_scan = edges.coalesce(loop_parts)
            labels = labels.coalesce(loop_parts)
        # the previous round's stepped table: it backs the LAZY jump
        # checkpoint until the next round's sum materializes it, so
        # its release is deferred exactly one round (r13 — see the
        # one-job-per-round note at the jump below)
        jump_input = None
        for _ in range(max_iterations):
            neighbor_min = (
                edges_scan.join(
                    labels.withColumnRenamed(id_col, "src"), "src"
                )
                .groupBy("dst")
                .agg(F.min("cluster_id").alias("_nmin"))
                .withColumnRenamed("dst", id_col)
            )
            # checkpointed BEFORE the self-join below, which would
            # otherwise evaluate the step plan (a shuffle join + agg)
            # once per side. Lazy: the convergence sum right after is
            # the materializing action, so the round has exactly ONE
            # job barrier (the sum computes the pending lazy jump and
            # this round's step in one job).
            stepped = (
                labels.join(neighbor_min, id_col, "left")
                .select(
                    id_col,
                    F.least(
                        F.col("cluster_id"), F.coalesce("_nmin", "cluster_id")
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=False)
            )
            cur_sum, _ = _label_sum(stepped)
            # stepped is materialized → the previous round's label
            # blocks (and the stepped table behind the now-computed
            # lazy jump) back nothing live; release them now
            release_frame(labels_store)
            if jump_input is not None:
                release_frame(jump_input)
                jump_input = None
            if cur_sum == prev_sum:
                # the STEP changed nothing (sums of a pointwise-
                # decreasing chain are equal ⇒ the frames are equal):
                # over SYMMETRIC edges a step fixpoint forces equal
                # labels across every edge, i.e. component-constant
                # labels — and a component's constant label is the id
                # of a member, which (labels only decrease from ids)
                # must be the component minimum. Converged — the final
                # round's pointer-jump join never runs (r8: this was
                # previously detected one jump later, costing an extra
                # self-join + checkpoint per clustering).
                labels = stepped
                converged = True
                break
            prev_sum = cur_sum
            # pointer jump: cluster_id ← label(cluster_id). Labels are
            # node ids, so the label table maps its own values; one
            # extra self-join per round turns O(diameter) convergence
            # into O(log diameter) — a 1M chain is ~20 rounds, not 1M.
            # (A second same-plan jump was tried in r4 and REVERTED:
            # composing the un-checkpointed jumped frame with itself
            # trips Catalyst's self-join disambiguation — the outer
            # join resolves against the inner alias, convergence
            # stalls, and planning time grows ~5× per round. One jump
            # between checkpoints is the stable form — LAZY since r13:
            # localCheckpoint(eager=False) still swaps the plan for a
            # concrete LogicalRDD immediately (the alias hygiene the
            # eager form bought), but materialization folds into the
            # NEXT round's convergence-sum job instead of paying its
            # own eager job — ~0.25 s of pure job/stage protocol per
            # round at gate scale (q100 trace), one fewer barrier per
            # round at any scale. stepped is materialized above, so
            # its double consumption here reads blocks; it stays
            # alive (jump_input) until the jump RDD computes.
            labels = (
                stepped.alias("a")
                .join(
                    stepped.select(
                        F.col(id_col).alias("_jid"),
                        F.col("cluster_id").alias("_jlab"),
                    ),
                    F.col("a.cluster_id") == F.col("_jid"),
                    "left",
                )
                .select(
                    F.col(f"a.{id_col}").alias(id_col),
                    F.least(
                        F.col("a.cluster_id"),
                        F.coalesce("_jlab", F.col("a.cluster_id")),
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=False)
            )
            labels_store = labels
            jump_input = stepped
        if jump_input is not None:
            # budget exhausted with a pending lazy jump: the loop exit
            # paths below either raise or hand over to the star
            # variant — the un-materialized jump and its input back
            # nothing they need
            release_frame(jump_input)
        if not converged:
            if algorithm == "minlabel":
                # the raise abandons the final round's label table —
                # free its checkpoint blocks or a catch-and-retry
                # session leaks one label table per attempt
                release_frame(labels_store)
                raise RuntimeError(
                    f"connected_components: no fixpoint after "
                    f"{max_iterations} rounds — use algorithm='star' "
                    "(large-star/small-star) for this graph"
                )
            # auto: the budget being exhausted is the signal that the
            # topology wants the star variant — hand over wholesale
            release_frame(labels_store)
            return own(
                _star_components(edges, nodes, id_col, max_iterations),
                pairs,
            )
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", _orig_parts)
        edges.unpersist()
    # pairs rides along so a caller-supplied generator's own caches
    # (e.g. a jaccard_pairs prefix persist) release with the result
    # (the r5 generator-orphan convention)
    return own(labels, labels, pairs)


def _driver_components(
    edges: DataFrame, nodes: DataFrame, id_col: str
) -> DataFrame:
    """Driver-solved components for a bounded DISTINCT edge list:
    collect the (already persisted) edges, run vectorized min-label
    propagation + full pointer-jump compression over index-compressed
    numpy arrays, and LEFT-join the resulting (endpoint, min-id)
    table back onto the vertex set — isolated vertices keep their own
    id. Only edge ENDPOINTS ever reach the driver; the vertex set
    (corpus-sized at scale) stays distributed, so the output plan is
    lazy and vertex-sized like the loop's.

    Exactness: labels are index positions into the SORTED unique
    endpoint array, so min over labels == min over ids; propagation
    is a monotone decreasing fixpoint — the same component-minimum
    the distributed loop and the DuckDB recursive CTE compute.
    """
    import numpy as np

    rows = edges.collect()
    spark = edges.sparkSession
    id_type = edges.schema["src"].dataType.simpleString()
    small_schema = f"{id_col} {id_type}, cluster_id {id_type}"
    if rows:
        src = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
        dst = np.fromiter((r[1] for r in rows), dtype=np.int64, count=len(rows))
        uniq, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        s, d = inv[: len(src)], inv[len(src):]
        lab = np.arange(len(uniq), dtype=np.int64)
        while True:
            prev = lab
            nm = lab.copy()
            # edges are already symmetric (both orientations present)
            np.minimum.at(nm, d, lab[s])
            while True:  # pointer-jump to a rooted forest
                j = nm[nm]
                if np.array_equal(j, nm):
                    break
                nm = j
            if np.array_equal(nm, prev):
                break
            lab = nm
        # emit via pandas: near the edge cap the endpoint table is
        # millions of rows, and the Arrow path (enabled in the engine
        # session) ships the two int64 buffers directly instead of
        # serializing one Python tuple per row
        import pandas as pd

        labeled = spark.createDataFrame(
            pd.DataFrame({id_col: uniq, "cluster_id": uniq[lab]}),
            small_schema,
        )
    else:
        labeled = spark.createDataFrame([], small_schema)
    return nodes.join(
        F.broadcast(labeled.withColumnRenamed("cluster_id", "_cc")),
        id_col,
        "left",
    ).select(
        id_col, F.coalesce("_cc", F.col(id_col)).alias("cluster_id")
    )


def _star_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iterations: int,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al. 2014).

    State is an oriented edge set (child > parent). Each round:

    - **large-star**: group the UNDIRECTED neighborhoods by node u,
      m = min(N(u) ∪ {u}); re-point every strictly larger neighbor
      at m: emit (v, m) for v ∈ N(u), v > u.
    - **small-star**: orient edges (hi → lo), group by hi,
      m = min(N); re-point hi and all its smaller neighbors at m:
      emit (hi, m) and (v, m) for v ∈ N \\ {m}.

    Both emit strictly (child > parent) pairs, shrink the potential
    Σ parent monotonically, and shuffle only on VERTEX ids — a giant
    component never concentrates a reduce key the way a shared
    cluster label does (its hub degrees are ordinary join skew,
    which AQE splits). Fixpoint = the edge set is unchanged; the
    state is then a star per component rooted at its minimum.
    """
    # star rounds double the iteration budget: each (large, small)
    # pair is one logical round and convergence is O(log² n) worst
    # case vs min-label's O(log d) typical
    # lazy checkpoints throughout: the count right after each one is
    # its materializing action — 1 job per round's state, not 2
    state = (
        edges.where(F.col("src") > F.col("dst"))
        .select(F.col("src").alias("c"), F.col("dst").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_n = state.count()
    converged = False
    for _ in range(max(2 * max_iterations, 8)):
        # ---- large-star ----
        nbr = state.select("c", "p").unionAll(
            state.select(F.col("p").alias("c"), F.col("c").alias("p"))
        )  # (u=c, v=p) both directions; per-node neighborhoods
        mins = nbr.groupBy("c").agg(F.min("p").alias("_mn"))
        big = (
            nbr.join(mins, "c")
            .where(F.col("p") > F.col("c"))
            .select(
                F.col("p").alias("c"),
                F.least(F.col("_mn"), F.col("c")).alias("p"),
            )
        )
        # ---- small-star (on the large-star output) ----
        oriented = big.where(F.col("c") != F.col("p")).distinct()
        smins = oriented.groupBy("c").agg(F.min("p").alias("_m"))
        joined = oriented.join(smins, "c")
        new_state = (
            joined.where(F.col("p") != F.col("_m"))
            .select(F.col("p").alias("c"), F.col("_m").alias("p"))
            .unionAll(smins.select("c", F.col("_m").alias("p")))
            .where(F.col("c") != F.col("p"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        n = new_state.count()
        # exact set-equality fixpoint: equal cardinality + one-sided
        # containment (left_anti empty) ⇒ identical edge sets
        if n == prev_n and new_state.join(
            state, ["c", "p"], "left_anti"
        ).isEmpty():
            release_frame(state)
            state = new_state
            converged = True
            break
        release_frame(state)
        state = new_state
        prev_n = n
    # at fixpoint the state is a star per component: child → root.
    # Min-agg in case the loop exhausted its budget one round short
    # of a perfect star (parents only ever decrease, so min is still
    # the best-known root) — validated below in that case.
    parent = state.groupBy("c").agg(F.min("p").alias("_root"))
    out = (
        nodes.join(parent.withColumnRenamed("c", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("_root", F.col(id_col)).alias("cluster_id"),
        )
        .localCheckpoint(eager=True)
    )
    release_frame(state)
    if not converged:
        # Budget exhausted before the edge-set fixpoint. The labels
        # are often exact anyway (they stabilize before the oriented
        # edges do), but cluster_id is contractually the component
        # MINIMUM, and silently returning an under-merged labeling
        # would split dedup clusters. Edge-consistency proves
        # exactness here: parents strictly decrease and stay inside
        # their component, so if both endpoints of every edge share a
        # label, each component carries one label L that the
        # component's minimum node also carries — forcing L = min.
        la = out.select(F.col(id_col).alias("_s"), F.col("cluster_id").alias("_ls"))
        lb = out.select(F.col(id_col).alias("_d"), F.col("cluster_id").alias("_ld"))
        split_edge = (
            edges.select(F.col("src").alias("_s"), F.col("dst").alias("_d"))
            .join(la, "_s")
            .join(lb, "_d")
            .where(F.col("_ls") != F.col("_ld"))
        )
        if not split_edge.isEmpty():
            release_frame(out)
            raise RuntimeError(
                "connected_components(star): no fixpoint after "
                f"{max(2 * max_iterations, 8)} large/small-star rounds "
                "and the partial labels under-merge — raise "
                "max_iterations for this graph"
            )
    return own(out, out)


def dedup_decisions(
    components: DataFrame, id_col: str = "id"
) -> DataFrame:
    """[id, cluster_id] → add ``keep`` (true for the cluster minimum —
    the deterministic survivor) and ``cluster_size``.

    Shape: groupBy-aggregate + join back, NOT a window over
    ``cluster_id`` — a window packs every row of a cluster into ONE
    task, so a giant dedup cluster (the exact topology the star
    fallback exists for) serializes on a single core. The aggregate
    partial-combines map-side regardless of skew, the per-cluster
    stats table is tiny (one row per cluster), and AQE can split the
    skewed probe side of the join — none of which a window partition
    allows (r4; same hot-key reasoning as the star variant)."""
    stats = components.groupBy("cluster_id").agg(
        F.min(id_col).alias("_min_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return own(
        components.join(stats, "cluster_id").select(
            id_col,
            "cluster_id",
            (F.col(id_col) == F.col("_min_id")).alias("keep"),
            "cluster_size",
        ),
        components,
    )


def quality_representatives(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "quality_e4",
) -> DataFrame:
    """``[id, cluster_id] ⋈ [id, score]`` → per-doc keep/drop where
    the survivor is the cluster's argmax on ``(score, then min id)``
    — the quality-aware variant of :func:`dedup_decisions`. Real
    fuzzy-dedup pipelines keep the BEST near-duplicate (the cleanest
    crawl of a page, the highest-quality revision), not the first-by-
    id one; composing components with a quality table makes that
    policy a one-join step.

    Deterministic: ``max_by`` on the struct ``(score, -id)`` is a
    total order (ids unique), so ties on score keep the smallest id.
    Same groupBy-aggregate + join-back shape as ``dedup_decisions``
    (NO window over ``cluster_id``) for the same giant-cluster skew
    reasons: the per-cluster stats table partial-combines map-side
    and stays one row per cluster.

    The score table may be PARTIAL (scores joined LEFT): every
    component member keeps its row — a missing score must not
    silently drop a doc from the keep/drop table or deflate
    ``cluster_size`` — unscored members just can't win (``max_by``
    skips null orderings); a cluster with NO scored member falls
    back to the ``dedup_decisions`` min-id survivor.

    Output: ``[id, cluster_id, <score_col>, keep, cluster_size]``
    (``score_col`` null for unscored members).
    """
    labeled = components.join(scores, id_col, "left")
    stats = labeled.groupBy("cluster_id").agg(
        F.coalesce(
            F.max_by(
                id_col,
                F.when(
                    F.col(score_col).isNotNull(),
                    F.struct(F.col(score_col), (-F.col(id_col)).alias("_n")),
                ),
            ),
            F.min(id_col),
        ).alias("_rep"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return own(
        labeled.join(stats, "cluster_id").select(
            id_col,
            "cluster_id",
            score_col,
            (F.col(id_col) == F.col("_rep")).alias("keep"),
            "cluster_size",
        ),
        components,
    )


def _graph_driver_max_edges(override: int | None) -> int:
    """Shared cap for the graph-analytics driver fast paths (triangle
    counts, fixed-point PageRank) — the same decision class as
    ``connected_components``'s ``driver_max_edges``: a candidate-pair
    graph small enough to collect is solved on the driver in one
    vectorized numpy pass instead of a multi-stage shuffle ladder
    whose per-job driver latency dominates at any scale. 0 disables
    (distributed path only)."""
    if override is not None:
        return override
    import os

    return int(
        os.environ.get("SPARK_GRAFT_GRAPH_DRIVER_MAX_EDGES", "2000000")
    )


def _driver_triangle_counts(
    edge_rows: list, nodes: DataFrame, wedge_cap: int = 64_000_000
) -> DataFrame | None:
    """Driver-solved per-vertex triangle counts for a bounded pair
    list: an ENTRY-level numpy replication of the distributed
    degree-ordered wedge join — same multiset-degree orientation,
    same strict ``(deg, id)`` wedge ordering, same closing-edge
    multiplicity semantics — so the counts are identical for any
    input the distributed plan accepts (duplicate pairs and
    self-loops included). Only edge ENDPOINTS reach the driver; the
    vertex set stays distributed and the output plan is lazy and
    vertex-sized (broadcast LEFT-join back, zero-fill).

    Returns ``None`` when the wedge budget (Σ per-source out-pairs)
    exceeds ``wedge_cap`` — the signal that the quadratic wedge
    expansion wants the distributed join after all.
    """
    import numpy as np
    import pandas as pd

    spark = nodes.sparkSession
    id_type = nodes.schema["id"].dataType.simpleString()
    small_schema = f"id {id_type}, n_triangles long"
    if edge_rows:
        m = len(edge_rows)
        a = np.fromiter((r[0] for r in edge_rows), np.int64, count=m)
        b = np.fromiter((r[1] for r in edge_rows), np.int64, count=m)
        uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ai, bi = inv[:m], inv[m:]
        nv = len(uniq)
        # multiset degree over both endpoints (the distributed deg
        # table counts duplicate pair rows too)
        deg = np.bincount(ai, minlength=nv) + np.bincount(bi, minlength=nv)
        # orient each entry from its lower-(deg, id) endpoint; uniq is
        # sorted, so index order == id order
        lower_first = (deg[ai] < deg[bi]) | (
            (deg[ai] == deg[bi]) & (ai < bi)
        )
        src = np.where(lower_first, ai, bi)
        dst = np.where(lower_first, bi, ai)
        # sort entries by (src, rank(dst)) with rank = (deg, id): a
        # group's sorted order makes every in-order entry pair satisfy
        # rank_i <= rank_j, and rank ties are exactly dst ties
        order = np.lexsort((dst, deg[dst], src))
        src, dst = src[order], dst[order]
        change = np.empty(m, dtype=bool)
        change[0] = True
        change[1:] = src[1:] != src[:-1]
        gstart = np.maximum.accumulate(
            np.where(change, np.arange(m), 0)
        )
        loc = np.arange(m) - gstart  # 0-based index within the group
        W = int(loc.sum())  # Σ k·(k−1)/2 over groups
        if W > wedge_cap:
            return None
        if W:
            cum = np.concatenate(([0], np.cumsum(loc)))
            j_idx = np.repeat(np.arange(m), loc)
            i_idx = np.arange(W) - cum[j_idx] + gstart[j_idx]
            v, w = dst[i_idx], dst[j_idx]
            u = src[j_idx]
            strict = v != w  # rank_i < rank_j ⟺ dst differs
            u, v, w = u[strict], v[strict], w[strict]
            # closing-edge multiplicity: each matching oriented entry
            # closes the wedge once (the distributed join multiplies)
            ekeys = np.sort(src.astype(np.int64) * nv + dst)
            wkeys = v.astype(np.int64) * nv + w
            c = np.searchsorted(ekeys, wkeys, side="right") - (
                np.searchsorted(ekeys, wkeys, side="left")
            )
            closed = c > 0
            c = c[closed]
            n_tri = np.zeros(nv, dtype=np.int64)
            np.add.at(n_tri, u[closed], c)
            np.add.at(n_tri, v[closed], c)
            np.add.at(n_tri, w[closed], c)
        else:
            n_tri = np.zeros(nv, dtype=np.int64)
        nz = n_tri > 0
        labeled = spark.createDataFrame(
            pd.DataFrame({"id": uniq[nz], "n_triangles": n_tri[nz]}),
            small_schema,
        )
    else:
        labeled = spark.createDataFrame([], small_schema)
    return nodes.join(
        F.broadcast(labeled.withColumnRenamed("n_triangles", "_nt")),
        "id",
        "left",
    ).select(
        "id",
        F.coalesce("_nt", F.lit(0)).cast("long").alias("n_triangles"),
    )


def triangle_counts(
    pairs: DataFrame,
    vertices: DataFrame,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Per-vertex triangle participation over an undirected pair list
    (``a_id < b_id``) — the clustering-coefficient numerator, and for
    a near-dup graph a direct "mutually-similar triple" detector.

    Shape: degree-oriented wedge join (the standard at-scale
    formulation). Each undirected edge is oriented from its
    lower-``(degree, id)`` endpoint to its higher one, so every
    vertex's OUT-degree is bounded by O(√m) whatever its raw degree
    (a vertex can only point at neighbors at least as central as
    itself). Wedges are then pairs of out-edges sharing a source —
    hub vertices of a power-law pair graph (exactly what near-dup
    graphs are) contribute no wedges from their hub side, so the
    wedge join cannot hot-key — and a wedge (u→v, u→w) closes into a
    triangle iff the oriented edge v→w exists. Each triangle is
    enumerated exactly once (from its lowest-rank corner); the id-
    ordered three-way join this replaces shuffled hub vertices' full
    adjacency. ``(degree, id)`` is a total order, so orientation is
    deterministic and the counts are orientation-invariant either
    way.

    Output: ``[id, n_triangles]`` — every vertex, zero-filled.
    The raw pair list is consumed twice (degree pass + orientation)
    and the oriented edge list three times (both wedge sides +
    closure probe), so BOTH are persisted — pair generators like the
    Jaccard join are far more expensive than the edge list is large,
    and skipping the input pin re-ran the generator per consumer
    (caught by bench.py's r10 self-adjudication: q90 2.6→12 s).
    Released via ``cache.release(result)``.

    ``driver_max_edges`` (default from
    ``SPARK_GRAFT_GRAPH_DRIVER_MAX_EDGES``, 0 disables): when the
    pair list fits under the cap AND the wedge expansion fits the
    driver budget, the counts are solved on the driver in one
    vectorized numpy pass (``_driver_triangle_counts`` — an exact
    entry-level replication of this wedge join) instead of the
    5-shuffle ladder, whose per-job driver latency dominates at
    candidate-graph sizes (same §5 bounded-driver-work class as
    ``connected_components``). The count that gates it materializes
    the same persist the degree pass would; over-cap graphs take the
    join ladder unchanged.
    """
    e = pairs.select(
        F.col("a_id").alias("a"), F.col("b_id").alias("b")
    ).persist()
    cap = _graph_driver_max_edges(driver_max_edges)
    if cap > 0 and e.count() <= cap:
        out = _driver_triangle_counts(
            e.collect(),
            vertices.select(F.col("id")).distinct(),
        )
        if out is not None:
            # the edge cache backs nothing in the output plan, but it
            # rides the result so release() reaches the generator's
            # own pins exactly like the distributed path
            return own(out, e, pairs, vertices)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("id").alias("b"), F.col("_deg").alias("_db"))
    ranked = e.join(da, "a").join(db, "b")
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    # oriented edge [src → dst] with the dst's rank carried for the
    # wedge-ordering comparison below
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lower_first, F.col("_db")).otherwise(F.col("_da")).alias(
            "_ddeg"
        ),
    ).persist()
    w1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.col("_ddeg").alias("_dv"),
    )
    w2 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w"),
        F.col("_ddeg").alias("_dw"),
    )
    # order the wedge arms by the same (degree, id) rank so each
    # unordered out-neighbor pair appears once, and the closing edge
    # (v, w) carries exactly the orientation the edge list stores
    wedges = w1.join(w2, "u").filter(
        (F.col("_dv") < F.col("_dw"))
        | ((F.col("_dv") == F.col("_dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    # ONE pass over the triangle enumeration: a 3-branch unionAll of
    # corner projections re-ran the wedge+closure join per branch
    # (union branches share no CSE; only their input exchanges get
    # reused) — measured 3× the join cost at gate scale (r11)
    corners = tri.select(
        F.explode(F.array("u", "v", "w")).alias("id")
    )
    per_v = corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))
    # pairs/vertices ride along so an upstream generator's own caches
    # (e.g. the Jaccard prefix pin) release with this result even when
    # the caller stripped their ownership attributes
    return own(
        vertices.select(F.col("id"))
        .distinct()
        .join(per_v, "id", "left")
        .select(
            "id",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        ),
        e,
        oriented,
        pairs,
        vertices,
    )


def _driver_pagerank(
    sym_rows: list,
    verts: DataFrame,
    base: int,
    teleport: int,
    iterations: int,
) -> DataFrame:
    """Driver-solved fixed-point PageRank for a bounded symmetric
    edge list — the identical int64 arithmetic as the unrolled
    distributed plan (multiset degree over ALL sym rows; pr rows
    exist only for edge endpoints that are IN ``verts``, checked with
    one broadcast semi-join; ``div`` = floor division on the
    non-negative operands here), so the result is bit-identical.
    Isolated ``verts`` rows never receive edge mass: their pr is the
    constant ``teleport`` after step 1 (``base`` at 0 iterations) —
    applied as the LEFT-join fill, so the vertex set itself stays
    distributed and only endpoints reach the driver.
    """
    import numpy as np
    import pandas as pd

    spark = verts.sparkSession
    id_type = verts.schema["id"].dataType.simpleString()
    small_schema = f"id {id_type}, _pr long"
    if sym_rows:
        m = len(sym_rows)
        s_raw = np.fromiter((r[0] for r in sym_rows), np.int64, count=m)
        d_raw = np.fromiter((r[1] for r in sym_rows), np.int64, count=m)
        uniq, inv = np.unique(
            np.concatenate([s_raw, d_raw]), return_inverse=True
        )
        s, d = inv[:m], inv[m:]
        nv = len(uniq)
        # which endpoints hold a pr row: the distributed plan's
        # pr-table join keeps only verts members as contribution
        # SOURCES (and deg still counts every sym row) — one
        # endpoint-sized broadcast semi-join settles membership
        ep = spark.createDataFrame(
            pd.DataFrame({"id": uniq}), f"id {id_type}"
        )
        member = {
            r[0]
            for r in verts.join(F.broadcast(ep), "id", "left_semi").collect()
        }
        in_verts = np.fromiter(
            (int(u) in member for u in uniq), dtype=bool, count=nv
        )
        deg = np.bincount(s, minlength=nv).astype(np.int64)
        pr = np.full(nv, base, dtype=np.int64)
        src_mask = in_verts[s]
        sm, dm = s[src_mask], d[src_mask]
        for _ in range(iterations):
            contrib = pr[sm] // deg[sm]
            incoming = np.zeros(nv, dtype=np.int64)
            np.add.at(incoming, dm, contrib)
            pr = teleport + (85 * incoming) // 100
        labeled = spark.createDataFrame(
            pd.DataFrame({"id": uniq[in_verts], "_pr": pr[in_verts]}),
            small_schema,
        )
    else:
        labeled = spark.createDataFrame([], small_schema)
    fill = base if iterations == 0 else teleport
    return verts.join(F.broadcast(labeled), "id", "left").select(
        "id",
        F.coalesce("_pr", F.lit(fill)).cast("long").alias("pr_e9"),
    )


def pagerank_fixed(
    pairs: DataFrame,
    vertices: DataFrame,
    *,
    iterations: int = 3,
    scale: int = 10**9,
    checkpoint_every: int | None = None,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Exact-integer PageRank over the symmetric closure of an
    undirected pair list: ``iterations`` unrolled power steps in e9
    fixed point — every operation is an int64 division or sum, so the
    result is bit-identical in any engine and any partition order (an
    oracle-checkable PageRank, which float implementations can never
    be). Isolated vertices hold the teleport mass; dangling
    redistribution is vacuous on a symmetric graph (documented
    convention, mirrored in the oracle).

    pr0 = scale div N;  pr' = (15·(scale div N)) div 100
                             + (85·Σ_{u~v} (pr[u] div deg[u])) div 100

    Shape: degree table once (vertex-keyed agg), then per iteration
    one edge⋈pr join (vertex-keyed, partial-combined sum). Unrolled
    because the iteration count is a small constant — no driver loop
    state, one linear plan; Catalyst pipelines the joins. At 100 TB
    each step is the standard vertex-partitioned join.

    ``checkpoint_every=k`` localCheckpoints the pr frame every k
    steps (never the final one), bounding plan depth/analysis cost
    for large ``iterations`` — the default linear unroll is right at
    3, quadratic-planning pain starts around 10+. Checkpoint blocks
    ride the result's ownership handles, so ``cache.release(result)``
    frees them; as with every localCheckpoint, the released result is
    dead afterwards (release only after materializing).

    Output: ``[id, pr_e9]``.
    """
    # persisted: the edge list is consumed by the degree table AND by
    # every iteration's join — without the pin an expensive pair
    # GENERATOR upstream (the Jaccard join here) re-executes per step.
    # Single-scan symmetrization (explode, not union) for the same
    # reason as connected_components: the persist's FIRST
    # materialization must not run the generator twice.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a_id").alias("src"), F.col("b_id").alias("dst")),
                F.struct(F.col("b_id").alias("src"), F.col("a_id").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst").persist()
    verts = vertices.select(F.col("id")).distinct().persist()
    n = verts.count()
    base = int(scale) // max(n, 1)
    teleport = (15 * base) // 100
    # Driver fast path (guide §5 bounded driver work, §1.2 fewer job
    # barriers — the connected_components precedent): a candidate-pair
    # graph under the cap is solved in one vectorized int64 numpy pass
    # instead of `iterations` chained join+agg shuffle stages. The
    # count materializes the same persist the degree table would; the
    # collected rows are the symmetric closure (2 per pair).
    cap = _graph_driver_max_edges(driver_max_edges)
    if cap > 0 and sym.count() <= 2 * cap:
        out = _driver_pagerank(
            sym.collect(), verts, base, teleport, iterations
        )
        return own(out, sym, verts, pairs, vertices)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    pr = verts.select("id", F.lit(base).cast("long").alias("pr_e9"))
    ckpts: list[DataFrame] = []
    for step in range(1, iterations + 1):
        contrib = (
            sym.join(pr.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("pr_e9 div _deg").alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_in"))
        )
        pr = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.expr("85 * coalesce(_in, 0L) div 100")
                ).cast("long").alias("pr_e9"),
            )
        )
        if (
            checkpoint_every
            and step % checkpoint_every == 0
            and step < iterations  # final frame stays a live plan
        ):
            pr = pr.localCheckpoint(eager=True)
            if ckpts:
                # the new checkpoint is fully materialized (eager), so
                # the predecessor's blocks are unreachable — free them
                # NOW instead of holding iterations/checkpoint_every
                # vertex tables until release (the point of the knob
                # is LARGE iteration counts)
                release_frame(ckpts.pop())
            ckpts.append(pr)
    return own(pr, sym, verts, pairs, vertices, *ckpts)
