#!/usr/bin/env python
"""Finer-grained phase profile of the pretrain pipeline: wall-clock
per operator call (not just the localCheckpoint materializations), so
the between-checkpoint work (pair-table construction, CC, split,
DSIR model, census) is attributed. Two reps; rep1 is the warm
measurement."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from aden_hive_fork_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="r12-pipeline-phases")
    sc = spark.sparkContext

    from aden_hive_fork_spark.operators import pretrain_pipeline as pp
    from aden_hive_fork_spark.operators.dedup import (
        dedup_by_components,
        exact_dedup,
        simhash_md5_neardup_pairs,
        winnowing_neardup_pairs,
    )
    from aden_hive_fork_spark.operators.langid import langid_train_predict
    from aden_hive_fork_spark.operators.normalize import normalize_corpus
    from aden_hive_fork_spark.operators.packing import pack_token_stream
    from aden_hive_fork_spark.operators.pii import detect_pii, redact_pii
    from aden_hive_fork_spark.operators.quality import ngram_repetition
    from aden_hive_fork_spark.operators.sampling import (
        decontaminate_split,
        dsir_importance,
        token_budget_sample,
        train_test_split,
    )
    from aden_hive_fork_spark.suite._helpers import T

    for rep in range(2):
        t_rep = time.time()

        def phase(tag, fn):
            sc.setJobDescription(f"rep{rep} {tag}")
            t0 = time.time()
            out = fn()
            print(f"  rep{rep} {tag:28s} {time.time() - t0:6.2f}s", flush=True)
            return out

        docs = T(spark, sf_dir, "documents")
        cols = ["doc_id", "text", "lang", "source", "n_chars"]
        s1 = phase("s1 base ckpt", lambda: docs.filter(
            F.col("text").isNotNull() & F.col("doc_id").isNotNull()
        ).select(*cols).repartition(64, "doc_id").localCheckpoint(eager=True))
        s1b = phase("s1b normalize", lambda: normalize_corpus(
            s1, text_col="text", chars_col="n_chars").localCheckpoint(eager=True))
        prof_pred = phase("s2a langid train+predict", lambda: langid_train_predict(
            s1b, "text", "lang", "doc_id", n=pp.LANGID_N,
            profile_size=pp.LANGID_PROFILE))
        pred = prof_pred[1]
        s2 = phase("s2b langid join ckpt", lambda: s1b.join(
            pred.filter(F.col("n_doc_grams") > 0).select("doc_id", "pred_lang"),
            "doc_id",
        ).filter(F.col("pred_lang") == F.col("lang")).select(*cols)
         .localCheckpoint(eager=True))
        rep_df = phase("s3a ngram_repetition", lambda: ngram_repetition(
            s2, "doc_id", "text", top_n=2, dup_n=5))
        s3 = phase("s3b quality join ckpt", lambda: s2.join(
            rep_df.filter(
                (F.col("top_frac") <= pp.QUALITY_MAX_TOP_FRAC)
                & (F.col("dup_frac") <= pp.QUALITY_MAX_DUP_FRAC)
            ).select("doc_id"), "doc_id").localCheckpoint(eager=True))
        s4 = phase("s4 exact_dedup ckpt", lambda: exact_dedup(
            s3.withColumn("_fp", F.md5(F.lower(F.trim(F.col("text"))))),
            ["_fp"], "doc_id").drop("_fp").localCheckpoint(eager=True))
        wpairs = phase("s5a winnowing pairs", lambda: winnowing_neardup_pairs(
            s4, id_col="doc_id", text_col="text", k=3, window=4,
            min_overlap=0.5, max_fp_df=100).select("id_a", "id_b"))
        s5 = phase("s5b CC dedup ckpt", lambda: dedup_by_components(
            s4, wpairs, "doc_id").localCheckpoint(eager=True))
        split = phase("s6a train_test_split", lambda: train_test_split(
            s5, "doc_id", test_percent=pp.TEST_PERCENT))
        xpairs = phase("s6b simhash pairs", lambda: simhash_md5_neardup_pairs(
            s5, id_col="doc_id", text_col="text", k=pp.SIMHASH_K,
            max_hamming=pp.SIMHASH_MAX_HAMMING).select("id_a", "id_b"))
        clean = phase("s6c decontaminate", lambda: decontaminate_split(
            split, xpairs, id_col="doc_id")[0])
        s6 = phase("s6d train ckpt", lambda: clean.filter(
            F.col("split") == "train").select(*cols).localCheckpoint(eager=True))
        scores = phase("s7a dsir_importance", lambda: dsir_importance(
            s6.withColumn("_t", F.col("lang") == "en"), "doc_id", "text", "_t"))
        s7 = phase("s7b dsir join ckpt", lambda: s6.join(
            scores.filter(F.col("log_ratio") > 0).select("doc_id"),
            "doc_id").localCheckpoint(eager=True))
        s8 = phase("s8 token_budget ckpt", lambda: token_budget_sample(
            s7, cost_col="n_chars", budget=pp.BUDGET_PER_SOURCE,
            group_cols=["source"], id_cols=["doc_id"],
        ).select(*cols).localCheckpoint(eager=True))
        s8b = phase("s8b pii ckpt", lambda: s8.withColumn(
            "text", redact_pii("text")
        ).withColumn("n_chars", F.length("text").cast("bigint"))
         .select(*cols).localCheckpoint(eager=True))
        packed = phase("s9 pack", lambda: pack_token_stream(
            s8b, "doc_id", "n_chars", capacity=pp.PACK_CAPACITY))
        stages = {
            "1_base": s1, "1b_normalize": s1b, "2_langid": s2,
            "3_quality": s3, "4_exact_dedup": s4, "5_near_dedup": s5,
            "6_decontam": s6, "7_dsir": s7, "8_mixture": s8,
            "8b_pii": s8b, "9_packed": packed,
        }
        census = phase("census build", lambda: pp.pretrain_pipeline_census(
            docs, stages=stages))
        phase("census collect", lambda: census.collect())
        print(f"rep{rep}: TOTAL {time.time() - t_rep:.2f}s", flush=True)
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
