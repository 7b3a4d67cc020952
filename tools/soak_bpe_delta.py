"""A/B soak: BPE delta pair-counting vs full per-pass recount (r4
verdict task 7).

Same deterministic 50k-word syllable-lexicon corpus as
``soak_tokenizers.py`` (the r4 8192-merge soak measured 697.5 s there,
~2.7 s/pass, dominated by the full pair-count aggregate each pass).
Measures both modes at an A/B-affordable merge budget, asserts the
merge sequences are bit-for-bit identical, then runs the full
8192-merge production soak in delta mode for comparison against the r4
number. Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.bpe import train_bpe  # noqa: E402
from tools.soak_tokenizers import build_corpus  # noqa: E402


def main():
    ab_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    full_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    corpus = build_corpus(spark)

    results = {}
    for mode in ("full", "delta"):
        t0 = time.time()
        model = train_bpe(corpus, num_merges=ab_merges, batch=32,
                          min_count=2, max_words=50_000,
                          pair_counts=mode)
        dt = time.time() - t0
        results[mode] = model
        print(json.dumps({
            "ab": mode, "merges": ab_merges, "batch": 32,
            "train_sec": round(dt, 1),
            "sec_per_pass": round(dt / (ab_merges / 32), 2)}), flush=True)
    assert results["full"].merges == results["delta"].merges, \
        "delta mode diverged from full recount"
    print(json.dumps({"ab_parity": "identical",
                      "merges_compared": ab_merges}), flush=True)

    if full_merges:
        t0 = time.time()
        model = train_bpe(corpus, num_merges=full_merges, batch=32,
                          min_count=2, max_words=50_000,
                          pair_counts="delta")
        dt = time.time() - t0
        print(json.dumps({
            "soak": "delta", "merges_requested": full_merges,
            "merges_learned": len(model.merges), "batch": 32,
            "train_sec": round(dt, 1),
            "sec_per_pass": round(dt / (full_merges / 32), 2),
            "r4_full_mode_reference_sec": 697.5}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
