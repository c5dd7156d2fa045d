"""Quiet-box A/B for the shingle-family drift (round-5 verdict item 5):
min-of-3 wall times at sf0.1 for the four shingle queries, df-cap ON
(the registered r5 configuration) vs df-cap OFF (the r4 semantics), on
an otherwise idle box. Prints one JSON line; results are recorded in
BASELINE.md."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as entry
from pagerank_mapreduce_implementation_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-shingle-cap")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = entry.Catalog(spark, SF_DIR).documents

    variants = {
        "ngram_jaccard_dedup/capped": lambda: dedup.ngram_jaccard_pairs(
            docs, 0.2, ngram=5, max_shingle_df=entry.NGRAM_MAX_SHINGLE_DF
        ),
        "ngram_jaccard_dedup/uncapped": lambda: dedup.ngram_jaccard_pairs(
            docs, 0.2, ngram=5
        ),
        "ngram_containment/capped": lambda: dedup.ngram_containment_pairs(
            docs, 0.5, ngram=5, max_shingle_df=entry.NGRAM_MAX_SHINGLE_DF
        ),
        "ngram_containment/uncapped": lambda: dedup.ngram_containment_pairs(
            docs, 0.5, ngram=5
        ),
        "ngram_jaccard_prefix": lambda: dedup.ngram_jaccard_prefix_pairs(
            docs, 0.2, ngram=5
        ),
        "minhash_dedup": lambda: dedup.minhash_near_dups(
            docs, threshold=0.5, ngram=5
        ),
    }
    out = {}
    for name, fn in variants.items():
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            df = fn()
            n = df.count()
            times.append(round(time.monotonic() - t0, 3))
            # drop any checkpoint the op pinned so runs are independent
            m = spark.sparkContext._jsc.getPersistentRDDs()
            for k in m.keySet().toArray():
                m.get(k).unpersist(False)
        out[name] = {"min_sec": min(times), "all": times, "rows": n}
        print(f"{name}: min={min(times)} all={times} rows={n}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
