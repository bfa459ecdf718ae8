#!/usr/bin/env python
"""Dataset curation report ("data card" generator): one command runs
the corpus-audit battery from the operator library and prints a JSON
report — the artifact a dataset release attaches alongside the data.

    python examples/curation_report.py --sf-dir /root/testdata/sf0.01

Sections:
  - privacy: k-anonymity violations, l-diversity violations, and a
    differentially-private event-count release (Laplace eps=1)
  - target_fit: DSIR importance-weight summary per language (how far
    each slice sits from the lang=en target domain)
  - label_noise: kNN-disagreement suspects over the embedding audit
    sample
  - tokenizer: the first 5 BPE merges the corpus would train
  - layout: size-balanced output shard count
  - duplication: containment (truncation-copy) pair count + the
    cross-source duplication matrix's heaviest cells
  - outliers_mad / mean_ci95 / changepoints: robust Hampel flags,
    Poisson-bootstrap 95% intervals, and CUSUM changepoints per
    event type

Every number is a pure function of the data (seeded hashing, decimal
sums), so the report is reproducible run-to-run and across engines —
the same discipline the oracle gate enforces on each underlying
operator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = p.parse_args()

    from kinesis_analytics_demo_spark.operators.curation2 import (
        bpe_train_merges,
        corpus_dsir_weights,
        corpus_rebalance_shards,
        dp_noisy_counts,
        k_anonymity_audit,
        l_diversity_audit,
        label_knn_disagreement,
    )
    from kinesis_analytics_demo_spark.session import read_table

    spark = get_spark(app_name="curation-report")
    sf = args.sf_dir

    report: dict = {"sf_dir": sf}

    report["privacy"] = {
        "k_anonymity_violating_groups": k_anonymity_audit(spark, sf).count(),
        "l_diversity_violating_groups": l_diversity_audit(spark, sf).count(),
        "dp_event_counts_eps1": {
            r["event_type"]: r["noisy_count"]
            for r in dp_noisy_counts(spark, sf).collect()
        },
    }

    docs = read_table(spark, sf, "documents").select("doc_id", "lang")
    by_lang = (
        corpus_dsir_weights(spark, sf)
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.round(F.avg("log_weight"), 4).alias("mean_log_weight"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect()
    )
    report["target_fit"] = {
        r["lang"]: {"mean_log_weight": r["mean_log_weight"], "n_docs": r["n_docs"]}
        for r in by_lang
    }

    suspects = (
        label_knn_disagreement(spark, sf)
        .filter(F.col("suspect"))
        .select("vec_id", "label", "frac_disagree")
        .collect()
    )
    report["label_noise"] = {
        "audit_sample_suspects": [
            {"vec_id": r["vec_id"], "label": r["label"],
             "frac_disagree": r["frac_disagree"]}
            for r in suspects
        ]
    }

    report["tokenizer"] = {
        "first_bpe_merges": [
            {"merged": r["merged"], "pair_count": r["pair_count"]}
            for r in bpe_train_merges(spark, sf).collect()
        ]
    }

    shards = corpus_rebalance_shards(spark, sf)
    report["layout"] = {
        "n_output_shards": shards.agg(
            (F.max("shard_id") + 1).cast("int").alias("n")
        ).collect()[0]["n"]
    }

    # -- round-4 batch-3 sections -----------------------------------
    from kinesis_analytics_demo_spark.operators.dedup2 import (
        dedup_containment_pairs,
        dedup_cross_source_matrix,
    )
    from kinesis_analytics_demo_spark.operators.stats2 import (
        anomaly_mad_events,
        bootstrap_ci_event_values,
        cusum_changepoint_events,
    )

    report["duplication"] = {
        "containment_pairs_08": dedup_containment_pairs(spark, sf).count(),
        "cross_source_cells": [
            {"src_a": r["src_a"], "src_b": r["src_b"], "pairs": r["dup_pairs"]}
            for r in dedup_cross_source_matrix(spark, sf)
            .orderBy(F.desc("dup_pairs"), "src_a", "src_b")
            .limit(5)
            .collect()
        ],
    }
    report["outliers_mad"] = {
        r["event_type"]: {"n_outliers": r["n_outliers"], "mad": r["mad"]}
        for r in anomaly_mad_events(spark, sf).collect()
    }
    report["mean_ci95"] = {
        r["event_type"]: [r["ci_lo"], r["ci_hi"]]
        for r in bootstrap_ci_event_values(spark, sf).collect()
    }
    report["changepoints"] = {
        r["event_type"]: {"cp_ts": r["cp_ts"], "score": r["cusum_score"]}
        for r in cusum_changepoint_events(spark, sf).collect()
    }

    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
