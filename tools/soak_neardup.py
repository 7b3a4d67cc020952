"""Near-dup candidate-generation scale curve (r4 verdict task 6):
measure ``simhash_neardup_pairs`` and ``embedding_neardup_pairs`` at
sf0.1 and at "sf1" (10x documents/embeddings) and report wall time,
CANDIDATE-pair counts (the bucket-collision volume the pigeonhole /
banded-LSH designs bound), and verified-pair counts at both scales.
One JSON line per (operator, scale) on stdout.

Scale-up construction preserves the near-dup DENSITY of the corpus
instead of manufacturing cross-replica twins (naive 10x replication
would give every doc 9 identical copies → 45 extra pairs per doc,
swamping the curve):

- documents: each replica applies a replica-specific consonant/vowel
  permutation via ``translate`` — token structure and lengths are
  unchanged, but every shingle/hash differs across replicas, so each
  replica contributes an independent copy of the original near-dup
  structure.
- embeddings: each replica applies a replica-specific diagonal ±1 sign
  flip (a true orthogonal transform): all WITHIN-replica cosines are
  bit-identical to the originals while cross-replica cosines are
  uncorrelated.

Expected shape if candidate generation is sub-quadratic: candidates and
verified pairs both ~10x, wall time well under 100x (the all-pairs
slope).
"""

from __future__ import annotations

import json
import string
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.dedup import (  # noqa: E402
    simhash_neardup_pairs,
)
from apsviz_timeseriesdb_ingest_spark.llm.similarity import (  # noqa: E402
    embedding_neardup_pairs,
)

DOCS = "/root/testdata/sf0.1/documents.parquet"
EMB = "/root/testdata/sf0.1/embeddings.parquet"
REPLICAS = 10
OFFSET = 10_000_000


def replicate_docs(spark, n: int) -> DataFrame:
    """10x the documents with per-replica letter permutations (replica 0
    is the identity — the sf0.1 corpus is a literal subset)."""
    import random

    base = spark.read.parquet(DOCS)
    letters = string.ascii_lowercase
    parts = []
    for r in range(n):
        rng = random.Random(9000 + r)
        perm = list(letters)
        if r:
            rng.shuffle(perm)
        parts.append(base.select(
            (F.col("doc_id") + F.lit(r * OFFSET)).alias("doc_id"),
            F.translate(F.col("text"), letters, "".join(perm))
            .alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_embeddings(spark, n: int) -> DataFrame:
    """10x the embeddings with per-replica diagonal sign flips (replica
    0 is the identity)."""
    base = spark.read.parquet(EMB)
    parts = []
    for r in range(n):
        if r:
            seed = F.lit(r)
            vec = F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(seed, i, F.lit("soak-flip")), 2)
                    == 0, x).otherwise(-x))
        else:
            vec = F.col("embedding")
        parts.append(base.select(
            (F.col("vec_id") + F.lit(r * OFFSET)).alias("vec_id"),
            vec.alias("embedding")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def simhash_candidates(df: DataFrame) -> int:
    """Bucket-collision candidate volume: sum over (block_idx,
    block_val) buckets of C(size, 2) — what the pigeonhole equi-join
    feeds the hamming verify."""
    from apsviz_timeseriesdb_ingest_spark.llm.dedup import simhash

    sig = simhash(df, bits=60)
    n_blocks, bits = 5, 60
    bounds, lo = [], 0
    for i in range(n_blocks):
        width = bits // n_blocks
        bounds.append((lo, width))
        lo += width
    blocks = F.array(*[
        F.struct(F.lit(i).alias("block_idx"),
                 (F.shiftright(F.col("simhash"), blo) % F.lit(1 << width))
                 .alias("block_val"))
        for i, (blo, width) in enumerate(bounds)])
    row = (sig.select(F.explode(blocks).alias("b"))
           .groupBy("b.block_idx", "b.block_val").count()
           .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)
                .alias("cand")).collect()[0])
    return int(row["cand"] or 0)


def embedding_candidates(df: DataFrame) -> int:
    """Per-band bucket-collision volume for the 12x8 sparse LSH family
    (upper bound on distinct candidates — the union dedups)."""
    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        _bucket_from_rows,
        _bucket_sql,
        sparse_hyperplane_rows,
    )

    bands, planes = 12, 8
    coeffs = sparse_hyperplane_rows(64, bands * planes, 8)
    v = df.select(F.col("embedding").cast("array<double>").alias("vec"))
    total = 0
    cols = []
    for t in range(bands):
        rows = coeffs[t * planes:(t + 1) * planes]
        sql = _bucket_sql("vec", rows)
        col = F.expr(sql) if sql is not None else \
            _bucket_from_rows(F.col("vec"), rows)
        cols.append(col.alias(f"b{t}"))
    bucketed = v.select(*cols)
    for t in range(bands):
        row = (bucketed.groupBy(f"b{t}").count()
               .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)
                    .alias("cand")).collect()[0])
        total += int(row["cand"] or 0)
    return total


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    for label, n in (("sf0.1", 1), ("sf1", REPLICAS)):
        docs = replicate_docs(spark, n).cache()
        n_docs = docs.count()
        cand = simhash_candidates(docs)
        t0 = time.time()
        pairs = simhash_neardup_pairs(docs, bits=60, max_hamming=4).count()
        dt = time.time() - t0
        print(json.dumps({
            "op": "simhash_neardup", "scale": label, "docs": n_docs,
            "candidate_pairs": cand, "verified_pairs": pairs,
            "wall_sec": round(dt, 1)}), flush=True)
        docs.unpersist()

    for label, n in (("sf0.1", 1), ("sf1", REPLICAS)):
        emb = replicate_embeddings(spark, n).cache()
        n_vec = emb.count()
        cand = embedding_candidates(emb)
        t0 = time.time()
        pairs = embedding_neardup_pairs(
            emb, threshold=0.4, dim=64, planes=8, bands=12,
            inv_density=8).count()
        dt = time.time() - t0
        print(json.dumps({
            "op": "embedding_neardup", "scale": label, "vectors": n_vec,
            "candidate_pairs": cand, "verified_pairs": pairs,
            "wall_sec": round(dt, 1)}), flush=True)
        emb.unpersist()

    # auto-tuned family (r6): planes scale with n so bucket occupancy —
    # and candidate volume per vector — stays constant. Measured at the
    # realistic near-dup operating point (threshold 0.85): sign-LSH
    # band counts stay small there (per-plane collision prob 0.82),
    # where the 0.4 threshold above is inherently hostile to it (prob
    # 0.63 → dozens of bands for any recall; hyperplane_tune reports
    # that honestly rather than hiding it). The verified count at 0.85
    # is near zero on this synthetic corpus — this leg measures the
    # CANDIDATE curve, the quantity that breaks at 100 TB.
    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        hyperplane_tune)

    for label, n in (("sf0.1", 1), ("sf1", REPLICAS)):
        emb = replicate_embeddings(spark, n).cache()
        n_vec = emb.count()
        tuned = hyperplane_tune(n_vec, 0.85)
        cand = embedding_neardup_pairs(
            emb, threshold=-1.0, dim=64, planes=tuned["planes"],
            bands=tuned["bands"], inv_density=8).count()
        t0 = time.time()
        pairs = embedding_neardup_pairs(
            emb, threshold=0.85, dim=64, planes="auto",
            inv_density=8).count()
        dt = time.time() - t0
        print(json.dumps({
            "op": "embedding_neardup_auto", "scale": label,
            "vectors": n_vec, "tuned": tuned, "candidate_pairs": cand,
            "verified_pairs": pairs, "wall_sec": round(dt, 1)}),
            flush=True)
        emb.unpersist()

    # SemDeDup end-to-end (cells -> within-cell pairs -> auto CC ->
    # keep-representative), k-means centroids trained on the ORIGINAL
    # vectors at both scales. TWO cluster-count policies per scale:
    # k fixed at the gate's 4 (per-cell occupancy grows with n, so the
    # within-cell pair join is quadratic-per-cell — the same cliff the
    # fixed-plane LSH family had) and k scaled to hold ~500 vectors
    # per cell (the SemDeDup paper's regime: cluster count grows with
    # the corpus, candidate volume stays ~linear). The r6 "auto" CC
    # runs the residual graph locally when small, star when not.
    from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
        semantic_dedup, train_kmeans)

    for label, n in (("sf0.1", 1), ("sf1", REPLICAS)):
        emb = replicate_embeddings(spark, n).cache()
        n_vec = emb.count()
        from apsviz_timeseriesdb_ingest_spark.llm.similarity import (
            semantic_k)

        for policy, k in (("fixed", 4), ("scaled", semantic_k(n_vec))):
            cents = train_kmeans(emb, k=k, iters=5)
            t0 = time.time()
            kept = semantic_dedup(emb, cents, threshold=0.4).count()
            dt = time.time() - t0
            print(json.dumps({
                "op": "semantic_dedup", "scale": label, "k": k,
                "policy": policy, "vectors": n_vec, "kept": kept,
                "dropped": n_vec - kept,
                "wall_sec": round(dt, 1)}), flush=True)
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
