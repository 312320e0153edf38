#!/usr/bin/env python
"""Scale-stress harness: ~sf1-equivalent SKEWED data, iterative-tier
timings, and a salted-vs-unsalted skew-join plan proof.

Builds a 10× replica of the sf0.1 fact tables in /tmp/scale_stress
with deliberate skew injected (one hot customer absorbs ~25% of
replicated orders; one hot user absorbs ~30% of replicated events),
then measures the queries whose cost scales superlinearly if the
plans are wrong: the iterative graph tier (PageRank, triangle count,
BFS) and the near-dup clustering tier. Also times a plain shuffled
aggregate-join against the hot key vs operators/joins.salted_join and
records whether AQE's skew-join split fired.

Usage: python scripts/scale_stress.py [--skip-build]
Writes one JSON line per measurement and a summary to
SCALE_STRESS.json. Results feed SCALING.md §"Measured skew stress".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_stress"
REPS = 10
HOT_CUST = 1  # absorbs skewed orders
HOT_USER = 7  # absorbs skewed events


def build(con) -> None:
    os.makedirs(DST, exist_ok=True)
    # dimension tables: copy as-is
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    # documents ×10: replicas are EXACT text dups re-keyed — worst
    # case for the n-gram/entropy text tier (every duplicated n-gram
    # table grows 10×, repetition fractions saturate)
    con.execute(f"""
      COPY (
        SELECT doc_id + rep * 10000000 AS doc_id,
          text, lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')
        CROSS JOIN (SELECT unnest(generate_series(0, {REPS - 1})) AS rep)
      ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)
    # orders ×10: rep 0 is the original; reps 1..9 re-key orderkey and
    # send 25% of customers to ONE hot key
    con.execute(f"""
      COPY (
        SELECT o_orderkey + rep * 10000000 AS o_orderkey,
          CASE WHEN rep > 0 AND o_custkey % 4 = 0
               THEN {HOT_CUST} ELSE o_custkey END AS o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet')
        CROSS JOIN (SELECT unnest(generate_series(0, {REPS - 1})) AS rep)
      ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
      COPY (
        SELECT l_orderkey + rep * 10000000 AS l_orderkey,
          l_partkey, l_suppkey, l_linenumber, l_quantity,
          l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
          l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet')
        CROSS JOIN (SELECT unnest(generate_series(0, {REPS - 1})) AS rep)
      ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
    """)
    # events ×10: 30% of replicated rows land on ONE hot user
    con.execute(f"""
      COPY (
        SELECT event_id + rep * 100000000 AS event_id, ts,
          CASE WHEN rep > 0 AND user_id % 3 = 0
               THEN {HOT_USER} ELSE user_id END AS user_id,
          event_type, value, props
        FROM read_parquet('{SRC}/events.parquet')
        CROSS JOIN (SELECT unnest(generate_series(0, {REPS - 1})) AS rep)
      ) TO '{DST}/events.parquet' (FORMAT PARQUET)
    """)
    # embeddings ×10: replicas are exact dups (worst case for CC)
    con.execute(f"""
      COPY (
        SELECT vec_id + rep * 1000000 AS vec_id, label, embedding
        FROM read_parquet('{SRC}/embeddings.parquet')
        CROSS JOIN (SELECT unnest(generate_series(0, {REPS - 1})) AS rep)
      ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
    """)


def timed(fn, *a, **kw):
    t0 = time.time()
    out = fn(*a, **kw)
    n = out if isinstance(out, int) else out.count()
    return round(time.time() - t0, 2), n


def main() -> int:
    import duckdb

    if "--skip-build" not in sys.argv:
        print("building skewed 10x dataset ...", flush=True)
        build(duckdb.connect())

    from pyspark.sql import functions as F

    from aden_hive_fork_spark.session import build_session
    from aden_hive_fork_spark.operators.joins import salted_join
    from aden_hive_fork_spark import suite

    spark = build_session(app_name="scale-stress", cpus=32,
                          shuffle_partitions=64)
    qs = suite.get_queries()
    results: dict = {"dataset": {
        "orders": 150_000 * REPS, "lineitem": 600_000 * REPS,
        "events": 100_000 * REPS, "embeddings": 5_000 * REPS,
        "skew": f"25% of replicated orders → custkey {HOT_CUST}; "
                f"30% of replicated events → user {HOT_USER}",
    }, "queries": {}}

    for name in ("q104_purchase_pagerank", "q125_triangle_count",
                 "q166_bfs_hops", "q79_cosine_neardup_clusters",
                 "q138_dense_ids", "q13_orders_above_avg",
                 "q191_local_supplier_volume",
                 # round-6 iterative/amplified tier
                 "q250_sssp_weighted", "q265_hits_ranking",
                 "q266_als_rank1", "q241_bootstrap_mean_ci",
                 "q260_pca_power_projection",
                 # round-7 window-free rank family + quantiles
                 "q272_revenue_concentration", "q277_kruskal_wallis",
                 "q291_mann_whitney", "q294_cusum_changepoint",
                 "q296_revenue_acf", "q299_scalable_quantiles",
                 # round-7 text/drift tier (VERDICT r7 task 5) —
                 # documents now ×10 exact-dup replicas, events hot-user
                 "q298_gopher_repetition", "q302_event_funnel",
                 "q303_word_entropy_profile", "q304_wasserstein_drift",
                 # round-8 builder analytics over the hot-user run log
                 "q306_run_failure_patterns", "q309_failure_analysis",
                 # round-8 training-data ops over documents ×10
                 "q311_sequence_packing", "q313_domain_mixture",
                 "q314_bpe_apply",
                 # round-9 gap-closers (VERDICT r8 task 3): per-key
                 # folds and banded joins with gated precedents
                 "q315_holt_winters", "q316_decontaminated_split",
                 "q307_error_categorizer", "q310_suggest_improvements",
                 "q312_packing_stats",
                 # round-9 langid over documents ×10 exact-dup replicas
                 "q317_langid_profiles", "q318_langid_predictions",
                 "q319_curated_corpus_census",
                 "q320_pq_adc_rerank_topk",
                 "q321_ivf_pq_topk",
                 # round-9b: winnowing/editdist dedup (documents ×10
                 # exact-dup replicas — worst case for banded joins),
                 # Heaps census, WordPiece greedy segmentation
                 "q322_winnowing_neardup",
                 "q323_editdist_verified_neardup",
                 "q324_vocab_growth", "q325_wordpiece_segments",
                 "q326_dsir_selection", "q327_curriculum_interleave",
                 "q328_ngram_overlap_eval", "q329_cohens_kappa",
                 "q330_zorder_layout_census", "q331_hrw_shard_census",
                 "q332_dataset_datasheet",
                 "q333_winnowing_dedup_survivors",
                 # round-10: unigram-LM trainer over documents ×10
                 # exact-dup replicas (vocab-sized EM relations must
                 # stay vocab-sized; only the ONE corpus pass grows)
                 "q334_unigram_lm_train", "q335_unigram_lm_segments",
                 # round-10 capstone: the nine-stage curation chain
                 # (exact dedup collapses the x10 replicas at stage 4)
                 "q336_pretrain_pipeline_census",
                 "q337_pretrain_final_datasheet",
                 # round-10: SemDeDup over embeddings ×10 exact
                 # replicas (worst case: every replica set is one
                 # giant within-cell cluster)
                 "q338_semdedup_verdicts",
                 # round-10: FAISS-default IVF-PQ (the 48 kmeans
                 # collect rounds are an index-BUILD cost — amortized
                 # over queries in production, re-paid per run here)
                 "q339_ivf_pq_residual_topk",
                 # round-10: all three tokenizer trainings in one
                 # statement (vocab-sized after the corpus reductions)
                 "q340_tokenizer_report",
                 # round-11: SemDeDup with Lloyd-refined cells over
                 # embeddings ×10 exact replicas (same worst case as
                 # q338 plus n_iter keyed-kmeans passes)
                 "q341_semdedup_kmeans_verdicts",
                 # round-11: Unicode normalize over documents ×10
                 # (map-only Arrow pass — must scale linearly)
                 "q342_unicode_normalize",
                 # round-12: ExactSubstr span removal over documents
                 # ×10 exact-dup replicas (worst case: EVERY n-gram
                 # is corpus-duplicated, so all positions are covered
                 # and the posting join carries the full gram table)
                 "q343_exact_substr_removal",
                 # round-12: full Gopher rule profile (map-only wide
                 # conditional — must scale linearly like q342)
                 "q344_gopher_quality",
                 # round-12: occurrence-mode ExactSubstr + SoftDeDup
                 # commonness over the x10 replicas (every gram 10x)
                 "q345_exact_substr_occurrences",
                 "q346_softdedup_weights"):
        if name not in qs:
            continue
        secs, rows = timed(lambda n=name: qs[n](spark, DST).count())
        print(f"{name}: {secs}s rows={rows}", flush=True)
        results["queries"][name] = {"sec": secs, "rows": rows}

    # round-12 (VERDICT r11 task 6): the num_cells=None ~sqrt(n)
    # default at the stress shape — the documented 100 TB posture,
    # exercised where cell-boundedness actually matters (50k vectors
    # → ~224 cells) rather than only at toy n.
    from aden_hive_fork_spark.operators.similarity import (
        default_num_cells,
        semdedup_kmeans_verdicts,
    )

    emb_s = spark.read.parquet(f"{DST}/embeddings.parquet")
    n_vec = emb_s.count()
    secs, rows = timed(
        lambda: semdedup_kmeans_verdicts(
            emb_s, threshold=0.3, num_cells=None, n_iter=2
        ).count()
    )
    results["queries"]["semdedup_kmeans_default_cells"] = {
        "sec": secs,
        "rows": rows,
        "n_vectors": n_vec,
        "num_cells": default_num_cells(n_vec),
    }
    print(
        f"semdedup_kmeans_default_cells: {secs}s rows={rows} "
        f"cells={default_num_cells(n_vec)}",
        flush=True,
    )

    # --- skew-join proof: hot-key fact ⋈ user dimension ----------------
    # user 7 holds ~30% of the 1M events; the dim is kept non-broadcast
    # to force the shuffle path where skew actually bites.
    ev = spark.read.parquet(f"{DST}/events.parquet")
    dim = spark.range(0, 1500).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("tier")
    )

    def hot_agg(joined):
        return joined.groupBy("tier").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
            F.max("props").alias("mp"),
        )

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # scale AQE's skew thresholds to this dataset (defaults are tuned
    # for multi-GB partitions; the MECHANISM is what we're proving —
    # at 100 TB the same split fires at default thresholds)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256k",
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    plain = hot_agg(ev.join(dim, "user_id"))
    t0 = time.time()
    # collect() executes THIS dataframe's QueryExecution (count() would
    # build a different plan whose adaptive state we can't inspect)
    n_plain = len(plain.collect())
    t_plain = round(time.time() - t0, 2)
    plan = plain._jdf.queryExecution().executedPlan().toString()
    aqe_skew = "skew=true" in plan and "skewed" in plan

    salted = hot_agg(salted_join(ev, dim, on="user_id", salt=16))
    t0 = time.time()
    n_salt = len(salted.collect())
    t_salt = round(time.time() - t0, 2)
    for k in ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
              "spark.sql.adaptive.advisoryPartitionSizeInBytes",
              "spark.sql.adaptive.skewJoin.skewedPartitionFactor"):
        spark.conf.unset(k)

    results["skew_join"] = {
        "plain_sec": t_plain, "salted_sec": t_salt,
        "rows": n_plain, "rows_salted": n_salt,
        "aqe_skew_split_fired": aqe_skew,
        "plan_markers": [
            ln.strip()[:120] for ln in plan.splitlines()
            if "skew" in ln.lower() or "SortMergeJoin" in ln
        ][:4],
    }
    print(f"skew join: plain={t_plain}s (AQE skew split: {aqe_skew}) "
          f"salted={t_salt}s", flush=True)

    with open("/root/repo/SCALE_STRESS.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
