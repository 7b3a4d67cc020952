"""Production-vocab tokenizer soak (r3 verdict task 7).

The sf0.1 documents table has a 31-word vocabulary (synthetic corpus),
which caps BPE at a few dozen merges — so the production-scale soak
runs on a generated syllable-lexicon corpus (50k distinct words, Zipf
weights, deterministic) where an 8k-merge BPE and a 4k-piece unigram
vocabulary are actually reachable, and additionally records sf0.1 at
its natural ceiling. Prints one JSON line per measurement.
"""

from __future__ import annotations

import hashlib
import json
import random
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.bpe import (  # noqa: E402
    bpe_encode_docs,
    train_bpe,
)
from apsviz_timeseriesdb_ingest_spark.llm.unigram import (  # noqa: E402
    train_unigram,
    unigram_encode_docs,
)

SYLLABLES = [c + v for c in "bcdfghjklmnprstvz" for v in "aeiou"] + \
    [c + v + t for c in "bdkmst" for v in "aeiou" for t in "nrs"]


def _word(i: int) -> str:
    h = hashlib.md5(f"lex|{i}".encode()).digest()
    n = 2 + h[0] % 4
    return "".join(SYLLABLES[int.from_bytes(h[1 + j:3 + j], "big")
                             % len(SYLLABLES)] for j in range(n))


def build_corpus(spark, n_docs: int = 5000, doc_len: int = 400,
                 lexicon: int = 50_000):
    lex = [_word(i) for i in range(lexicon)]
    rng = random.Random(11)
    rows = []
    for d in range(n_docs):
        # 70% Zipf head + 30% uniform tail: Zipfian frequencies AND a
        # corpus that actually exercises the full 50k lexicon (a pure
        # Pareto head never reaches the tail ranks)
        toks = [lex[min(int(rng.paretovariate(1.2)), lexicon - 1)]
                if rng.random() < 0.7 else lex[rng.randrange(lexicon)]
                for _ in range(doc_len)]
        rows.append((d, " ".join(toks)))
    return (spark.createDataFrame(rows, "doc_id long, text string")
            .repartition(32).localCheckpoint(eager=True))


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    corpus = build_corpus(spark)
    n_words = (corpus.select(F.explode(F.split(F.lower("text"), r"\s+")))
               .distinct().count())
    print(json.dumps({"corpus": "syllable-lex", "docs": corpus.count(),
                      "distinct_words": n_words}), flush=True)

    t0 = time.time()
    bpe = train_bpe(corpus, num_merges=8192, batch=32, min_count=2,
                    max_words=50_000)
    t_train = time.time() - t0
    t0 = time.time()
    enc = bpe_encode_docs(corpus, bpe, engine="pandas")
    n_tok = enc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    t_enc = time.time() - t0
    print(json.dumps({
        "tokenizer": "bpe", "merges_requested": 8192,
        "merges_learned": len(bpe.merges), "batch": 32,
        "passes": "<=ceil(merges/32)+overfetch-shortfall",
        "train_sec": round(t_train, 1), "encode_arrow_sec": round(t_enc, 1),
        "encoded_tokens": int(n_tok),
        "tokens_per_sec_encode": int(n_tok / t_enc)}), flush=True)

    t0 = time.time()
    uni = train_unigram(corpus, vocab_size=4096, seed_size=12_288,
                        max_piece_len=8, em_iters=2, max_words=50_000)
    t_train = time.time() - t0
    t0 = time.time()
    uenc = unigram_encode_docs(corpus, uni)
    un_tok = uenc.agg(F.sum("n_unigram_tokens")).collect()[0][0]
    t_enc = time.time() - t0
    print(json.dumps({
        "tokenizer": "unigram", "vocab_target": 4096,
        "vocab_learned": len(uni.pieces),
        "train_sec": round(t_train, 1), "encode_sec": round(t_enc, 1),
        "encoded_tokens": int(un_tok),
        "tokens_per_sec_encode": int(un_tok / t_enc)}), flush=True)

    # sf0.1 natural ceiling (31-word vocabulary)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    t0 = time.time()
    bpe01 = train_bpe(docs, num_merges=8192, batch=32, min_count=2)
    print(json.dumps({
        "tokenizer": "bpe", "corpus": "sf0.1",
        "merges_learned_at_ceiling": len(bpe01.merges),
        "train_sec": round(time.time() - t0, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
