"""Scale smoke: run the dedup/curation tier on a synthetic corpus
10-60x the sf0.1 gate data, generated in-memory (spark.range +
expressions — no files), to demonstrate the plans hold beyond the
test scale: linear-ish runtime, bounded executor memory, no
collect()-driven driver blowup.

Usage: python scripts/scale_smoke.py [n_docs] [round] [runs] [stages]
(defaults 300_000 — sf0.1 has 5_000 docs — $SPARK_GRAFT_ROUND or
none, 1 run per stage, and all stages; ``stages`` is a
comma-separated stage-name filter, also readable from
$SPARK_GRAFT_SMOKE_STAGES — re-checking one flagged stage should not
cost a 12-minute full matrix). A filtered run merges into the same
round's existing artifact, so partial re-measures keep the full
matrix. Prints one JSON line per stage. With
runs > 1 each stage repeats back-to-back and the artifact records
min + median + every pass — the r4 verdict's protocol for telling a
real trend from a hypervisor steal burst (the per-stage MIN is the
cross-round comparison number; the regression gate uses it).

Round-4 addition (r3 verdict item 7): when a round is given, the
stage matrix persists to SCALE_SMOKE_r{round}.json and is compared
against the most recent prior round's artifact — any stage slower
than 1.5x its prior time is flagged (exit code 3) so a scale
regression fails loudly instead of hiding in SCALING.md prose.
This host shows hypervisor steal bursts, so treat a flag as "re-run
in a quiet window", not as proof by itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_docs(spark, n: int):
    """Deterministic word-soup docs: ~40 tokens from a 2k-word vocab,
    with planted exact duplicates (every 97th doc repeats doc i-1's
    text) and heavy-tail token skew (low word ids appear often —
    stresses the LSH/minhash skew guards the way stopwords do)."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("w"),
                    # skewed vocab: xxhash mixes, pmod squares the tail
                    F.pmod(
                        F.pmod(F.xxhash64(F.col("id") * 41 + i), 2000)
                        * F.pmod(F.xxhash64(F.col("id") * 43 + i), 47),
                        2000,
                    ),
                ),
            ),
        ).alias("text"),
    )
    dup_src = base.withColumn("doc_id", F.col("doc_id") + 1).filter(
        F.pmod(F.col("doc_id"), 97) == 0
    )
    return (
        base.filter(F.pmod(F.col("doc_id"), 97) != 0)
        .unionByName(dup_src)
        .withColumn("source", F.pmod(F.col("doc_id"), 5).cast("string"))
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    rnd = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_ROUND", "")
    )
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    only = {
        s
        for s in (
            sys.argv[4]
            if len(sys.argv) > 4
            else os.environ.get("SPARK_GRAFT_SMOKE_STAGES", "")
        ).split(",")
        if s
    }
    from pyspark.sql import functions as F

    from odsc_agentic_ai_summit_2025_spark.session import get_spark
    from odsc_agentic_ai_summit_2025_spark.operators import dedup as dd
    from odsc_agentic_ai_summit_2025_spark.operators import curation as cu
    from odsc_agentic_ai_summit_2025_spark.operators import textops as tx

    spark = get_spark(app_name="scale_smoke")
    docs = synth_docs(spark, n).localCheckpoint(eager=True)  # fix the corpus
    n_docs = docs.count()
    # the corpus checkpoint's blocks must survive inter-stage cleanup:
    # a localCheckpoint has NO lineage to recompute from, so
    # unpersisting it kills every later stage (learned the hard way)
    keep = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    matrix: dict[str, dict] = {}

    # pinned quiet-host floors at the 300k-doc reference scale
    # (min-of-passes under the corrected GC protocol)
    _FLOORS = {
        "minhash_candidates": 11.0,   # r8: true floor ~9-11 s
        "curation_pipeline_e2e": 33.0,  # r8: 28.7-32.0 s
        "triangles_hub_star": 7.6,    # r10: 7.63 s quiet single-pass
        "windowed_hll": 1.5,          # r10: 1.47 s quiet single-pass
        "hdr_quantiles": 1.9,         # r10: 1.89 s quiet single-pass
        "neardup_admit": 16.0,        # r10: 16.18 s at 1.1% steal
        # r12: 3.51 s at 0.04% steal — admit + index-extend of a fixed
        # 5k delivery vs a standing 300k index (setup untimed)
        "neardup_index_extend": 3.5,
    }

    from odsc_agentic_ai_summit_2025_spark.cache import sweep_blocks

    def sweep():
        sweep_blocks(spark, keep)

    seen_stages: set[str] = set()

    from odsc_agentic_ai_summit_2025_spark import hostload

    def stage(name, fn):
        import statistics

        seen_stages.add(name)
        if only and name not in only:
            return
        secs, out, loads = [], None, []
        for _ in range(runs):
            ls0 = hostload.sample()
            gc0 = hostload.jvm_gc_ms(spark)
            t0 = time.perf_counter()
            out = fn()
            secs.append(round(time.perf_counter() - t0, 2))
            # per-pass host-load evidence (r6 verdict #8): an exit-3
            # flag raised during a double-digit steal_pct pass is a
            # noisy-window artifact by the recorded numbers. gc_ms
            # (r8, r7 verdict #6) splits stage-internal GC from
            # shuffle cost — a slow pass whose extra wall time is all
            # gc_ms is heap churn, not a plan regression.
            rec_load = hostload.delta(ls0, hostload.sample())
            gc1 = hostload.jvm_gc_ms(spark)
            if None not in (gc0, gc1):
                rec_load["gc_ms"] = gc1 - gc0
            loads.append(rec_load)
            sweep()
            # level the heap between passes — but only after passes
            # heavy enough to leave cleaner residue: a full GC taxes
            # the NEXT measurement a durable ~0.35 s (bench A/B, r8),
            # which dwarfs a sub-second stage while being invisible to
            # the 10-100 s ones whose 2-5× spreads it removes (the r7
            # minhash 25-61 s quiet-window spread was this residue)
            if secs[-1] >= 5.0:
                try:
                    spark._jvm.System.gc()
                except Exception:
                    pass
        rec = {"stage": name, "n_docs": n_docs, "result": out,
               "sec": min(secs),
               "sec_median": round(statistics.median(secs), 2),
               "passes": secs, "load": loads}
        # standing-floor regression flag (r9, verdict item 4): the
        # min-of-passes is compared against the pinned quiet-host
        # floor; >1.5x at low steal marks the artifact row so a real
        # plan regression can't hide inside run-to-run noise. Floors
        # use the CORRECTED protocol (inter-pass System.gc(), per-pass
        # gc_ms) — minhash's is ~9-11 s/300k docs, not the stale r7
        # ~21 s rebaseline (that number measured one pass + a share of
        # its predecessor's ContextCleaner residue; see SCALING.md r8).
        floor = _FLOORS.get(name)
        if floor is not None and n_docs >= 250_000:
            max_steal = max(
                (l.get("steal_pct", 0.0) or 0.0) for l in loads
            ) if loads else 0.0
            rec["floor_sec"] = floor
            rec["floor_flag"] = bool(
                rec["sec"] > 1.5 * floor and max_steal < 2.0
            )
        matrix[name] = {"result": out, "sec": rec["sec"],
                        "sec_median": rec["sec_median"], "passes": secs,
                        "load": loads}
        for k in ("floor_sec", "floor_flag"):
            if k in rec:
                matrix[name][k] = rec[k]
        print(json.dumps(rec), flush=True)

    stage(
        "exact_dedup",
        lambda: dd.exact_dedup_groups(docs, "text", "doc_id")
        .agg(F.count("*").alias("n")).collect()[0]["n"],
    )
    stage(
        "minhash_candidates",
        lambda: dd.minhash_candidate_pairs(docs, "text", "doc_id").count(),
    )
    stage(
        "simhash",
        lambda: dd.simhash_table(docs, "text").count(),
    )
    stage(
        "repetition_stats",
        lambda: cu.repetition_stats(docs, "text", "doc_id")
        .filter(F.col("repetitive")).count(),
    )
    def _gram_stage(fn):
        # both gram-tier operators attach their persisted occurrence
        # table to the result; count then release via the sweep
        out = fn(docs, "text", "doc_id", 8)
        return out.agg(F.sum("n_grams" if "n_grams" in out.columns
                             else "n_spans").alias("s")).collect()[0]["s"]

    stage(
        "span_dupes_8gram",
        lambda: _gram_stage(lambda d, t, i, l: dd.ngram_span_dupes(d, t, i, l=l)),
    )
    stage(
        "ngram_novelty_8gram",
        lambda: _gram_stage(lambda d, t, i, l: dd.ngram_novelty(d, t, i, l=l)),
    )
    stage(
        "source_mix",
        lambda: cu.source_mix_weights(docs, "source").count(),
    )

    def budget_stage():
        # grouped distributed prefix sum (q95): ~2.4M tokens/source at
        # the default corpus, 2M budgets → partial admission per source
        from odsc_agentic_ai_summit_2025_spark.cache import release

        out = cu.token_budget_sample(
            docs, "text", "doc_id", "source",
            {str(s): 2_000_000 for s in range(5)}, salt="smoke",
        )
        n_admit = out.filter(F.col("admit")).count()
        release(out)
        return n_admit

    stage("token_budget_sample", budget_stage)

    def dsir_stage():
        # DSIR importance toward the "0" source slice (q98's operator):
        # gram fan-out ~39 bigrams/doc → ~11.7M (gram, doc) rows through
        # one persisted agg, one gram-keyed count agg, one score join
        from odsc_agentic_ai_summit_2025_spark.cache import release

        out = cu.dsir_scores(docs, "text", "doc_id", "source", "0", n=2)
        got = out.agg(F.sum("importance_e4").alias("s")).collect()[0]["s"]
        release(out)
        return got

    stage("dsir_importance", dsir_stage)

    def dsir_cms_stage():
        # the 100-TB serving tier (q104's operator pair): fixed-size
        # paired Count-Min fit over the same corpus, then every doc
        # scored against the broadcast sketch — model side is ≤3·65536
        # cells regardless of n_docs, so this stage's growth is the
        # gram fan-out alone
        from odsc_agentic_ai_summit_2025_spark.cache import release

        cms = cu.dsir_model_cms(docs, "text", "source", "0", n=2)
        out = cu.dsir_score_with_cms_model(docs, cms, "text", "doc_id", n=2)
        got = out.agg(F.sum("importance_e4").alias("s")).collect()[0]["s"]
        release(out)
        return got

    stage("dsir_cms_serving", dsir_cms_stage)
    stage(
        "train_split",
        lambda: tx.train_split(docs, "doc_id")
        .groupBy("split").count().count(),
    )

    def pipeline_stage():
        # the COMPOSED q100 sequence at smoke scale: gate -> exact
        # dedup -> minhash near-dup clusters -> quality -> split as
        # one lazy program (its per-stage shapes are the stages
        # above; this measures the composition's end-to-end cost,
        # dominated by minhash banding + the components iterations)
        from odsc_agentic_ai_summit_2025_spark.pipeline import (
            build_curation_pipeline,
        )

        bench = docs.filter(F.pmod(F.col("doc_id"), 89) == 0)
        corpus = docs.filter(F.pmod(F.col("doc_id"), 89) != 0)
        pipe = build_curation_pipeline(corpus, bench)
        n = pipe.final.count()
        pipe.release()
        return n

    stage("curation_pipeline_e2e", pipeline_stage)

    _gk_memo: dict = {}

    def gate_kernel_stage():
        # the r6 24×-fix component in isolation: ~128k-gram benchmark
        # set (every-89th-doc slice), kernel path FORCED (literal_max
        # =0) — r6's Series.map form measured 41 s min here; the r7
        # flatten→is_in vectorization targets below that. The gram
        # set build (a fixed ~128k-row collect) is memoized, so pass
        # 1 carries it and min-of-passes reflects the gate scan alone
        # when runs ≥ 2.
        from odsc_agentic_ai_summit_2025_spark.cache import release

        if "grams" not in _gk_memo:
            bench = docs.filter(F.pmod(F.col("doc_id"), 89) == 0)
            _gk_memo["grams"] = cu.benchmark_gram_set(bench, "text", n=3)
        out = cu.ingest_gate(
            docs, _gk_memo["grams"], "text", "doc_id", literal_max=0
        )
        n = out.filter(F.col("admit")).count()
        release(out)
        return n

    stage("ingest_gate_kernel", gate_kernel_stage)

    def trails_stage():
        # variable-length trail expansion at graph scale (q103/q105's
        # operator): bounded-degree synthetic digraph — n_docs nodes
        # with 4 pseudo-random out-edges each (~1.2M edges), *1..3
        # trails, full (start, end, hops) dedup. Frontier state is
        # O(frontier · hops) edge keys; bounded degree d caps the
        # hop-h frontier at n·d^h (~19M rows at h=3 here) — the shape
        # Cypher's small-hop patterns assume. Hub-heavy graphs need
        # the components/BFS tier instead (operator docstring).
        from odsc_agentic_ai_summit_2025_spark.operators.graph import (
            variable_length_paths,
        )

        nodes = docs.select(F.col("doc_id").alias("src"))
        edges = nodes.select(
            "src",
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col("src") * 7 + j),
                            F.lit(n_docs),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("dst"),
        ).filter(F.col("src") != F.col("dst"))
        return variable_length_paths(edges, "src", "dst", 1, 3).count()

    stage("variable_paths_3hop", trails_stage)

    def hub_guard_stage():
        # the r8 hub-graph guard (VERDICT r7 #2): a star graph — every
        # node tied to one hub — is the worst case the reference's
        # `MATCH (a)-[r*1..4]-(b)` pattern can be aimed at. Undirected
        # hop-2 expansion is deg(hub)^2 ≈ n^2 trail rows (9e10 here);
        # max_frontier_rows must refuse BEFORE launching that join, in
        # seconds (this stage's `sec` IS the fail-fast evidence), and
        # leave no persisted frontier behind.
        from odsc_agentic_ai_summit_2025_spark.operators.graph import (
            FrontierExplosionError,
            variable_length_paths,
        )

        star = docs.select(
            F.col("doc_id").alias("src"), F.lit(0).alias("dst")
        ).filter(F.col("src") != 0)
        blocks0 = len(dict(spark.sparkContext._jsc.getPersistentRDDs()))
        try:
            variable_length_paths(
                star, "src", "dst", 1, 3,
                undirected=True, max_frontier_rows=50_000_000,
            )
        except FrontierExplosionError as e:
            assert "hop-2" in str(e), e
            blocks1 = len(
                dict(spark.sparkContext._jsc.getPersistentRDDs())
            )
            assert blocks1 <= blocks0, (blocks0, blocks1)
            return 1  # guard tripped where it must
        raise AssertionError("hub guard did not trip on the star graph")

    stage("trails_hub_guard", hub_guard_stage)

    def triangles_hub_stage():
        # degree-oriented triangle counting (r10, VERDICT r9 #2) on a
        # mid-id hub star: every node tied to node n/2, plus a ring
        # edge between consecutive low spokes (each closes exactly one
        # triangle with the hub). The id-ordered 3-way join this
        # replaced enumerated deg_low×deg_high ≈ (n/2)² wedge
        # candidates ALL keyed on the hub id (~2.25e10 rows here — a
        # single hot shuffle key that never completes); orientation
        # gives the hub zero out-edges, so wedges come only from
        # degree-≤3 spokes and the star completes in seconds — this
        # stage's `sec` IS the evidence.
        from odsc_agentic_ai_summit_2025_spark.cache import release
        from odsc_agentic_ai_summit_2025_spark.operators.components import (
            triangle_counts,
        )

        hub = n_docs // 2
        ids = spark.range(0, n_docs).select(F.col("id"))
        star = ids.filter(F.col("id") != hub).select(
            F.least(F.col("id"), F.lit(hub)).alias("a_id"),
            F.greatest(F.col("id"), F.lit(hub)).alias("b_id"),
        )
        ring = (
            spark.range(0, n_docs - 1)
            .filter(
                (F.pmod(F.col("id"), 3) == 1)
                & (F.col("id") != hub)
                & (F.col("id") + 1 != hub)
            )
            .select(F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id"))
        )
        n_ring = ring.count()
        out = triangle_counts(star.unionByName(ring), ids)
        total = out.agg(F.sum("n_triangles").alias("s")).collect()[0]["s"]
        release(out)
        assert total == 3 * n_ring, (total, n_ring)
        return n_ring

    stage("triangles_hub_star", triangles_hub_stage)

    def windowed_hll_stage():
        # q108's operator at corpus scale: 5 sources × 24 synthetic
        # hours, per-cell distinct-text estimate — the register table
        # caps at groups × 32 rows into the shuffle whatever n_docs.
        from odsc_agentic_ai_summit_2025_spark.operators.sketches import (
            hll_approx_distinct,
        )

        cells = docs.withColumn("hour", F.pmod(F.col("doc_id"), 24))
        return hll_approx_distinct(cells, ["source", "hour"], "text").count()

    stage("windowed_hll", windowed_hll_stage)

    def hdr_quantiles_stage():
        # q109's operator at corpus scale: p50/p99 of a wide-range
        # synthetic long measure per source — rank windows run over
        # the bucketed histogram (≤ ~1k rows per group), never the
        # raw rows.
        from odsc_agentic_ai_summit_2025_spark.operators.sketches import (
            hdr_quantiles,
        )

        vals = docs.select(
            "source", F.pmod(F.xxhash64("text"), F.lit(10**12)).alias("v")
        )
        return hdr_quantiles(vals, "v", ["source"], [5000, 9900]).count()

    stage("hdr_quantiles", hdr_quantiles_stage)

    def neardup_admit_stage():
        # q111's gate at corpus scale: 90% of the corpus as the
        # standing MinHash index, the other 10% as the delivery —
        # planted every-97th dups guarantee near_corpus hits. Probe
        # joins are delivery-sized; the index build is the one
        # corpus-scale pass (vectorized kernel, built once per
        # stage run).
        out = dd.neardup_admit_incremental(
            dd.minhash_signatures(
                docs.filter(F.pmod(F.col("doc_id"), 10) != 0),
                "text",
                "doc_id",
            ),
            docs.filter(F.pmod(F.col("doc_id"), 10) == 0),
            "text",
            "doc_id",
        )
        return out.filter(F.col("admitted")).count()

    stage("neardup_admit", neardup_admit_stage)

    # VERDICT r11 #5 — the standing-index EXTEND path at corpus
    # scale: a fixed 5k-doc delivery admitted against, then appended
    # to, a 300k-doc standing index. The standing artifacts (sigs,
    # bands, trimmed probe table) are built ONCE outside the timed
    # body — exactly a production gate's shape, where the index is a
    # persisted table, not a per-delivery rebuild. The timed body is
    # the delivery admit + neardup_index_add, whose claim is
    # delivery-proportional cost: corpus TEXT is never re-read (the
    # only corpus-sized touches are cache reads of the standing
    # tables the probe join must consult).
    if not only or "neardup_index_extend" in only:
        from odsc_agentic_ai_summit_2025_spark.operators.index_io import (
            neardup_index_add,
        )

        # standing artifacts are eager localCheckpoints, NOT persist():
        # the inter-pass sweep clears the SQL cache wholesale (keep
        # protects only block-manager RDD ids), so a persisted standing
        # index would be rebuilt from text on every pass — measured
        # 9 -> 44 s on pass 2 before this was caught
        nd_sigs = dd.minhash_signatures(docs, "text", "doc_id")\
            .localCheckpoint(eager=True)
        nd_idx = dd.build_neardup_index(
            docs, "text", "doc_id", sigs=nd_sigs
        )
        nd_idx.bands = nd_idx.bands.localCheckpoint(eager=True)
        nd_kept = dd.neardup_trimmed(
            nd_idx.bands, dd.neardup_bucket_census(nd_idx.bands)
        ).localCheckpoint(eager=True)
        # fixed delivery: the generator's tail slice past the corpus —
        # novel texts (mostly admitted, so the extend has a real delta)
        # with the planted every-97th dups exercising dup_in_batch
        nd_delivery = (
            synth_docs(spark, n + 5_000)
            .filter(F.col("doc_id") >= n)
            .localCheckpoint(eager=True)
        )
        nd_del_sigs = dd.minhash_signatures(
            nd_delivery, "text", "doc_id"
        ).localCheckpoint(eager=True)
        keep.update(spark.sparkContext._jsc.getPersistentRDDs().keySet())

        def neardup_index_extend_stage():
            admit = dd.neardup_admit_incremental(
                nd_idx.sigs, nd_delivery, "text", "doc_id",
                existing_kept=nd_kept, new_sigs=nd_del_sigs,
            )
            admitted = nd_delivery.join(
                admit.filter(F.col("admitted")).select("doc_id"), "doc_id"
            )
            idx2 = neardup_index_add(
                nd_idx, admitted, "text", admitted_sigs=nd_del_sigs
            )
            return {
                "admitted": admitted.count(),
                "delta_bands": idx2.delta_bands.count(),
            }

        stage("neardup_index_extend", neardup_index_extend_stage)

    # vector tier: synthetic unit-ish embeddings, planted exact dups
    # (every 61st vector equals its neighbor's → cosine 1 pairs)
    from odsc_agentic_ai_summit_2025_spark.operators import similarity as sim

    nv = max(n // 3, 10_000)
    src = F.when(F.pmod(F.col("id"), 61) == 0, F.col("id") + 1).otherwise(
        F.col("id")
    )
    base_v = spark.range(nv).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.pmod(F.xxhash64(src * 31 + i), 1000) / F.lit(500.0)
            - F.lit(1.0),
        ).alias("vector"),
    )
    vecs = base_v.localCheckpoint(eager=True)
    keep.update(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    stage(
        "neardup_lsh_vectors",
        lambda: sim.neardup_pairs_lsh(
            vecs, "vector", "vid", threshold=0.95
        ).count(),
    )
    def semantic_decontam_stage():
        # q107's operator at vector-smoke scale: ~100 benchmark
        # vectors broadcast as one dense matrix, one GEMM pass over
        # the corpus partitions, zero shuffle — per-doc hit counts.
        # Planted dups guarantee hits beyond the bench self-matches.
        from odsc_agentic_ai_summit_2025_spark.operators.curation import (
            semantic_decontamination,
        )

        bench = vecs.filter(F.pmod(F.col("vid"), 997) == 0)
        out = semantic_decontamination(
            vecs, bench, "vector", "vid", threshold=0.95
        )
        return out.filter(F.col("contaminated")).count()

    stage("semantic_decontam", semantic_decontam_stage)
    stage(
        "knn_100q",
        lambda: sim.knn_bruteforce(
            vecs,
            vecs.filter(F.col("vid") < 100).withColumnRenamed("vid", "qid"),
            "vector",
            "vid",
            "qid",
            k=10,
        ).count(),
    )

    def ivf_stage():
        from odsc_agentic_ai_summit_2025_spark.operators import ivf

        index = ivf.ivf_build(vecs, "vector", "vid", k_clusters=64)
        qs = vecs.filter(F.col("vid") < 100).withColumnRenamed("vid", "qid")
        return ivf.ivf_search(index, qs, "qid", k=10, nprobe=8).count()

    stage("ivf_build_and_search", ivf_stage)

    def pq_stage():
        from odsc_agentic_ai_summit_2025_spark.operators import pq as pqm

        index = pqm.pq_build(vecs, "vector", "vid")
        qs = vecs.filter(F.col("vid") < 100).withColumnRenamed("vid", "qid")
        n = pqm.pq_search(
            index, vecs, qs, "qid", k=10, shortlist=256
        ).count()
        index.release()
        return n

    stage("pq_build_and_search", pq_stage)

    # a typo'd stage filter must not masquerade as a completed
    # re-measure: zero stages would run, the artifact would be
    # rewritten from prior records only, and exit 0 would say "done"
    unknown = only - seen_stages
    if unknown:
        sys.exit(
            f"unknown stage name(s) {sorted(unknown)}; "
            f"known: {sorted(seen_stages)}"
        )

    if rnd:
        import glob
        import pathlib

        import re

        repo = pathlib.Path(__file__).resolve().parent.parent
        artifact = repo / f"SCALE_SMOKE_r{rnd}.json"
        # same-round re-run: keep the BEST (min-sec) record per stage
        # across runs — a noisy re-run must not clobber the good
        # artifact it was supposed to improve on (the r5 incident)
        if artifact.exists():
            prior_doc = json.loads(artifact.read_text())
            # min-merge only across runs of the SAME corpus size —
            # stage times at different n are not comparable
            same_n = prior_doc.get("n_docs") == n_docs
            if only and not same_n:
                # a FILTERED run at a different n would replace the
                # full matrix with a partial one — refuse instead of
                # destroying the round's baseline
                sys.exit(
                    f"stage-filtered run at n_docs={n_docs} would "
                    f"clobber {artifact.name} (n_docs="
                    f"{prior_doc.get('n_docs')}); rerun unfiltered "
                    "or match the artifact's corpus size"
                )
            old = prior_doc.get("stages", {}) if same_n else {}
            for name, rec in old.items():
                mine = matrix.get(name)
                if mine is None:
                    matrix[name] = dict(rec)
                    continue
                # keep the faster record, but the pass history from
                # BOTH runs either way — noise evidence must not
                # depend on which side won
                merged = dict(rec if rec["sec"] < mine["sec"] else mine)
                merged["passes"] = sorted(
                    rec.get("passes", []) + mine.get("passes", [])
                )
                # load records from both runs too (unsorted — each
                # entry belongs to its run, not to a ranked pass)
                merged["load"] = rec.get("load", []) + mine.get("load", [])
                matrix[name] = merged
        artifact.write_text(
            json.dumps({"n_docs": n_docs, "stages": matrix}, indent=1)
        )

        def _round_no(p: str) -> int:
            m = re.search(r"_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        # numeric sort: lexicographic puts r9 after r10 and would
        # gate round 11 against the stale r9 baseline
        prior = sorted(
            (
                p for p in glob.glob(str(repo / "SCALE_SMOKE_r*.json"))
                if p != str(artifact)
            ),
            key=_round_no,
        )
        flagged = []
        if prior:
            prev = json.loads(open(prior[-1]).read())
            for name, rec in matrix.items():
                old = prev.get("stages", {}).get(name)
                if old and old["sec"] > 0 and rec["sec"] > 1.5 * old["sec"]:
                    flagged.append(
                        {"stage": name, "prev_sec": old["sec"],
                         "sec": rec["sec"], "baseline": prior[-1]}
                    )
        print(json.dumps({"artifact": str(artifact), "flagged": flagged}),
              flush=True)
        if flagged:
            sys.exit(3)


if __name__ == "__main__":
    main()
