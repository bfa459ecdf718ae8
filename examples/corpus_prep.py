#!/usr/bin/env python
"""End-to-end LLM training-corpus preparation over a parquet corpus —
the batch flagship composed from the operator library: quality filter
-> exact dedup -> minhash near-dedup -> (optional) decontamination ->
deterministic train/val/test split, one corpus scan feeding both
dedup shuffles.

Run against the bundled synthetic corpus:

    python examples/corpus_prep.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/corpus_prep_out

Outputs a partitioned parquet of kept documents tagged with split and
quality score, plus a one-line JSON summary on stdout. Swap --sf-dir
for a 100 TB corpus root on a cluster: every stage is hash-keyed on
doc ids / 8-byte gram hashes, the only broadcasts are band signatures
of the (small) benchmark slice, and nothing ever collects to the
driver except the printed counts.
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
    p.add_argument("--out", default="/tmp/corpus_prep_out")
    p.add_argument(
        "--decontaminate",
        action="store_true",
        help="also drop training docs fuzzily matching the benchmark "
        "slice (decontamination_minhash, jaccard >= 0.5)",
    )
    args = p.parse_args()

    spark = get_spark(app_name="corpus-prep-example")

    from kinesis_analytics_demo_spark.functions import hashing as H
    from kinesis_analytics_demo_spark.operators.pipeline import (
        SPLIT_SLOTS,
        SPLIT_TEST_LO,
        SPLIT_VALID_LO,
        corpus_prep_kept_docs,
    )
    from kinesis_analytics_demo_spark.operators.training import (
        decontamination_minhash,
    )

    kept = corpus_prep_kept_docs(spark, args.sf_dir)
    slot = (
        H.md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % SPLIT_SLOTS
    )
    split = (
        F.when(slot >= SPLIT_TEST_LO, "test")
        .when(slot >= SPLIT_VALID_LO, "validation")
        .otherwise("train")
    )
    kept = kept.withColumn("split", split)
    if args.decontaminate:
        contaminated = decontamination_minhash(spark, args.sf_dir).select(
            "doc_id"
        )
        kept = kept.join(contaminated, "doc_id", "left_anti")

    kept.write.mode("overwrite").partitionBy("split").parquet(args.out)

    by_split = {
        r["split"]: r["n"]
        for r in kept.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(json.dumps({"out": args.out, "kept_by_split": by_split}))
    spark.stop()


if __name__ == "__main__":
    main()
