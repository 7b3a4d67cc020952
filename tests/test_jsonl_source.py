"""JSONL corpus source/sink: corrupt-line quarantine, gzip round-trip,
uniform sharding, pipeline integration."""

from __future__ import annotations

import glob
import gzip
import json

from apsviz_timeseriesdb_ingest_spark.sources.jsonl import (
    read_documents_jsonl,
    write_jsonl_sharded,
)


def _write_jsonl(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_quarantines_bad_lines(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl")
    _write_jsonl(p, [
        json.dumps({"doc_id": "a", "text": "hello world", "source": "s1"}),
        "{not json at all",
        json.dumps({"doc_id": "b", "text": "second doc"}),
        '["wrong", "shape"]',
    ])
    docs, quarantine = read_documents_jsonl(spark, p)
    got = {r.doc_id: r.text for r in docs.collect()}
    assert got == {"a": "hello world", "b": "second doc"}
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2 and "{not json at all" in bad


def test_gzip_roundtrip(spark, tmp_path):
    src = str(tmp_path / "in.jsonl.gz")
    with gzip.open(src, "wt") as f:
        for i in range(10):
            f.write(json.dumps({"doc_id": str(i), "text": f"doc {i}"}) + "\n")
    docs, quarantine = read_documents_jsonl(spark, src)
    assert docs.count() == 10 and quarantine.count() == 0


def test_sharded_write_uniform(spark, tmp_path):
    docs = spark.createDataFrame(
        [(str(i), f"text {i}") for i in range(100)], "doc_id string, text string")
    out = str(tmp_path / "out")
    shards = write_jsonl_sharded(docs, out, docs_per_shard=25,
                                 compression=None)
    assert shards == 4
    files = sorted(glob.glob(out + "/part-*"))
    assert len(files) == 4
    sizes = []
    for fp in files:
        with open(fp) as f:
            sizes.append(sum(1 for _ in f))
    assert sum(sizes) == 100
    assert max(sizes) - min(sizes) <= 10  # round-robin: near-uniform

    # round-trip preserves every doc
    docs2, _ = read_documents_jsonl(spark, out)
    assert {r.doc_id for r in docs2.collect()} == {str(i) for i in range(100)}


def test_jsonl_feeds_pipeline(spark, tmp_path):
    from apsviz_timeseriesdb_ingest_spark.llm.pipeline import (
        prepare_training_corpus,
    )
    p = str(tmp_path / "c.jsonl")
    _write_jsonl(p, [
        json.dumps({"doc_id": "1",
                    "text": "the cat sat on the mat and the dog is a "
                            "friend of the cat and they walk to the park"}),
        json.dumps({"doc_id": "2", "text": "too short"}),
        "garbage line",
    ])
    docs, quarantine = read_documents_jsonl(spark, p)
    corpus, audit = prepare_training_corpus(docs, None, min_tokens=10)
    assert {r.doc_id for r in corpus.collect()} == {"1"}
    assert quarantine.count() == 1
