"""Streaming corpus preparation: gates + in-stream dedup across
micro-batches, exactly-once restart, batch/stream lineage parity."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
    benchmark_shingles,
    run_corpus_stream,
    stream_prepare_corpus,
)

EN = ("the cat sat on the mat and the dog is a friend of the cat "
      "and they walk to the park every day to see the ducks swim")
EN2 = ("a quick brown fox jumps over the lazy dog and the fox is "
       "happy to run in the field all day with the other animals")
SHORT = "see https://example.com/a/b/c"
FR = ("le chat est dans le jardin et les oiseaux sont dans une "
      "cage et le chien est dans la maison dans une boite")
BENCH = "what is the capital of france and the answer is paris"
CONTAM = ("the benchmark question asks what is the capital of france "
          "and the answer to the benchmark question is paris of course")

SCHEMA = "doc_id long, text string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _bench_shingles(spark):
    return benchmark_shingles(
        spark.createDataFrame([(100, BENCH)], SCHEMA))


def test_stream_gates_and_cross_batch_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(1, EN), (3, SHORT), (5, FR), (8, CONTAM)])
    q = run_corpus_stream(spark, src, out, ckpt,
                          bench_shingles=_bench_shingles(spark))
    assert q.awaitTermination(120)
    # batch 2: a new doc, an exact dup of doc 1, an in-batch dup pair
    _write(spark, src, [(2, EN2), (9, EN), (10, EN2)])
    q2 = run_corpus_stream(spark, src, out, ckpt,
                           bench_shingles=_bench_shingles(spark))
    assert q2.awaitTermination(120)
    rows = {r.doc_id for r in spark.read.parquet(out).collect()}
    # 1 kept; 3 too short, 5 wrong language, 8 contaminated,
    # 9 dup of 1 (cross-batch state), 2 kept, 10 dup of 2 (in-batch)
    assert rows == {1, 2}


def test_stream_restart_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(1, EN)])
    q = run_corpus_stream(spark, src, out, ckpt)
    assert q.awaitTermination(120)
    # restart with no new input: no duplicate output rows
    q2 = run_corpus_stream(spark, src, out, ckpt)
    assert q2.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].doc_id == 1


def test_stream_prep_matches_batch_lineage(spark):
    docs = spark.createDataFrame(
        [(1, EN), (2, EN2), (3, SHORT), (5, FR), (9, EN)], SCHEMA)
    out = stream_prepare_corpus(docs)  # batch frame through the same fn
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_tokens == 28 and rows[1].predicted_lang == "en"


def test_contamination_literal_matches_batch_decontaminate(spark):
    docs = spark.createDataFrame([(1, EN), (8, CONTAM)], SCHEMA)
    out = stream_prepare_corpus(docs, _bench_shingles(spark))
    assert {r.doc_id for r in out.collect()} == {1}


def test_incremental_dedup_stream(spark, tmp_path):
    """Cross-batch NEAR-dedup via the persisted LSH index: stream state is
    zero; duplicate knowledge lives in the index table."""
    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        run_incremental_dedup_stream)

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    LSH = dict(k=2, num_hashes=8, bands=4)

    _write(spark, src, [(1, EN), (2, EN2)])
    q = run_incremental_dedup_stream(spark, src, catalog,
                                     checkpoint_dir=ckpt, **LSH)
    assert q.awaitTermination(120)
    assert {r.doc_id for r in catalog.read("stream_corpus").collect()} == {1, 2}

    # batch 2: near-dup of doc 1 (rejected via INDEX, not stream state),
    # an in-batch near-dup pair (13/14), and a new doc
    _write(spark, src, [(12, EN + " again"), (13, FR), (14, FR + " oui"),
                        (15, BENCH)])
    q2 = run_incremental_dedup_stream(spark, src, catalog,
                                      checkpoint_dir=ckpt, **LSH)
    assert q2.awaitTermination(120)
    got = {r.doc_id for r in catalog.read("stream_corpus").collect()}
    assert got == {1, 2, 13, 15}

    # replay the WHOLE input with a fresh checkpoint: the index rejects
    # everything — corpus unchanged (corpus-level idempotency)
    q3 = run_incremental_dedup_stream(spark, src, catalog,
                                      checkpoint_dir=str(tmp_path / "ckpt2"),
                                      **LSH)
    assert q3.awaitTermination(120)
    rows = catalog.read("stream_corpus").collect()
    assert {r.doc_id for r in rows} == {1, 2, 13, 15} and len(rows) == 4


def test_incremental_embedding_stream(spark, tmp_path):
    """Embedding twin of test_incremental_dedup_stream: cross-batch
    near-dup rejected by probing the PARTITIONED ANN corpus (no stream
    state), in-batch dups resolved to the smallest id, and a
    fresh-checkpoint replay of the whole input is a corpus no-op
    (every replayed vector matches itself at cosine 1.0)."""
    import random

    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        run_incremental_embedding_stream)

    rng = random.Random("emb-stream")
    dim = 8

    def vec(seed_axis, jitter=0.0):
        base = [0.0] * dim
        base[seed_axis] = 1.0
        return [float(b + rng.uniform(-jitter, jitter)) for b in base]

    centroids = [vec(0), vec(1), vec(2), vec(3)]
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    SCH = "vec_id long, embedding array<float>"

    def _write(rows):
        spark.createDataFrame(rows, SCH).write.mode("append").parquet(src)

    def _run(checkpoint):
        q = run_incremental_embedding_stream(
            spark, src, catalog, centroids, checkpoint_dir=checkpoint,
            threshold=0.95, nprobe=2, dim=dim)
        assert q.awaitTermination(120)

    # batch 1: two distinct vectors near different centroids
    _write([(1, vec(0, 0.05)), (2, vec(1, 0.05))])
    _run(ckpt)
    assert {r.vec_id for r in catalog.read("ann_corpus").collect()} == {1, 2}

    # batch 2: 12 ~= 1 (rejected via CORPUS probe, not stream state),
    # 13/14 in-batch near-dup pair (13 kept), 15 new
    v13 = vec(2, 0.02)
    v14 = [x * 1.001 for x in v13]
    _write([(12, [x * 1.002 for x in
                  [r.embedding for r in spark.read.parquet(src)
                   .filter("vec_id = 1").collect()][0]]),
            (13, v13), (14, v14), (15, vec(3, 0.05))])
    _run(ckpt)
    got = {r.vec_id for r in catalog.read("ann_corpus").collect()}
    assert got == {1, 2, 13, 15}

    # corpus is the partitioned ANN layout: cell dirs on disk
    import os
    assert any(d.startswith("centroid_id=")
               for d in os.listdir(catalog.path("ann_corpus")))

    # fresh-checkpoint replay of ALL input: self-match rejects everything
    _run(str(tmp_path / "ckpt2"))
    rows = catalog.read("ann_corpus").collect()
    assert {r.vec_id for r in rows} == {1, 2, 13, 15} and len(rows) == 4


def test_embedding_stream_partition_groups(spark, tmp_path):
    """partition_groups changes ONLY the on-disk layout: identical batch
    semantics (cross-batch reject via the group-pruned probe, in-batch
    pair, replay idempotence), directory count bounded at G with
    contiguous cell ranges, and the group filter composes with the
    cell predicate (r8 — the small-files fix the stream soak measured:
    per-batch cost grew ~sqrt(k) with per-cell partitioning)."""
    import os

    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        run_incremental_embedding_stream)

    dim = 8
    # 8 axis centroids, G=2 -> span=4: cells 0-3 in group 0, 4-7 in 1
    centroids = [[1.0 if i == a else 0.0 for i in range(dim)]
                 for a in range(8)]
    src = str(tmp_path / "in")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    SCH = "vec_id long, embedding array<float>"

    def _write(rows):
        spark.createDataFrame(rows, SCH).write.mode("append").parquet(src)

    def _run(ck):
        q = run_incremental_embedding_stream(
            spark, src, catalog, centroids,
            checkpoint_dir=str(tmp_path / ck),
            threshold=0.95, nprobe=2, dim=dim, partition_groups=2)
        assert q.awaitTermination(120)

    def axis(a, scale=1.0):
        return [scale if i == a else 0.0 for i in range(dim)]

    # batch 1: vectors in cells 0, 5 (both partition groups)
    _write([(1, axis(0)), (2, axis(5))])
    _run("ck")
    assert {r.vec_id for r in catalog.read("ann_corpus").collect()} == {1, 2}
    # layout: cell_group dirs, bounded at G=2, no per-cell dirs
    dirs = [d for d in os.listdir(catalog.path("ann_corpus"))
            if d.startswith("cell_group=")]
    assert dirs and len(dirs) <= 2
    assert not any(d.startswith("centroid_id=")
                   for d in os.listdir(catalog.path("ann_corpus")))

    # batch 2: 12 dups 1 (cross-batch, probe pruned to group 0),
    # 13 dups 2 (group 1), 14/15 in-batch pair in cell 6, 16 new
    _write([(12, axis(0, 1.002)), (13, axis(5, 1.001)),
            (14, axis(6)), (15, axis(6, 1.003)), (16, axis(3))])
    _run("ck")
    got = {r.vec_id for r in catalog.read("ann_corpus").collect()}
    assert got == {1, 2, 14, 16}
    # the data column survives for row-group pruning + cell math
    assert {r.centroid_id for r in
            catalog.read("ann_corpus").collect()} == {0, 5, 6, 3}

    # fresh-checkpoint replay: everything self-matches, corpus no-op
    _run("ck2")
    rows = catalog.read("ann_corpus").collect()
    assert {r.vec_id for r in rows} == {1, 2, 14, 16} and len(rows) == 4


def test_embedding_stream_semi_join_probe_and_layout_pin(spark, tmp_path):
    """(a) ``probe_literal_max=0`` forces the broadcast-semi-join cell
    predicate — batch semantics must be IDENTICAL to the literal-isin
    path (r8 verdict task 5: the per-batch probed-cells collect and
    isin list grew with |batch|·nprobe; past the bound the predicate
    becomes a broadcast semi-join with flat plan-build cost while the
    ≤G-value group filter stays literal). (b) The ``{table}_layout``
    sidecar pins (k, partition_groups) at setup: reopening the same
    corpus with a different G raises the targeted error instead of
    silently pruning the wrong directories (r8 ADVICE)."""
    import pytest

    from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog
    from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (
        run_incremental_embedding_stream)

    dim = 8
    centroids = [[1.0 if i == a else 0.0 for i in range(dim)]
                 for a in range(8)]
    src = str(tmp_path / "in")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    SCH = "vec_id long, embedding array<float>"

    def _write(rows):
        spark.createDataFrame(rows, SCH).write.mode("append").parquet(src)

    def _run(ck, groups=2, **kw):
        q = run_incremental_embedding_stream(
            spark, src, catalog, centroids,
            checkpoint_dir=str(tmp_path / ck),
            threshold=0.95, nprobe=2, dim=dim, partition_groups=groups,
            **kw)
        assert q.awaitTermination(120)

    def axis(a, scale=1.0):
        return [scale if i == a else 0.0 for i in range(dim)]

    _write([(1, axis(0)), (2, axis(5))])
    _run("ck", probe_literal_max=0)
    _write([(12, axis(0, 1.002)), (13, axis(5, 1.001)),
            (14, axis(6)), (15, axis(6, 1.003)), (16, axis(3))])
    _run("ck", probe_literal_max=0)
    # same accepted set as test_embedding_stream_partition_groups's
    # literal path: cross-batch rejects via the semi-join, in-batch
    # pair and replay semantics untouched
    got = {r.vec_id for r in catalog.read("ann_corpus").collect()}
    assert got == {1, 2, 14, 16}
    # replay on a fresh checkpoint: idempotent through the semi-join
    _run("ck2", probe_literal_max=0)
    rows = catalog.read("ann_corpus").collect()
    assert {r.vec_id for r in rows} == {1, 2, 14, 16} and len(rows) == 4
    # the sidecar pinned (k=8, G=2): a mismatched G or a toggle back
    # to per-cell partitioning fails loudly at SETUP
    row = catalog.read("ann_corpus_layout").collect()[0]
    assert (row["k"], row["partition_groups"]) == (8, 2)
    with pytest.raises(ValueError, match="do not match"):
        _run("ck3", groups=4)
    with pytest.raises(ValueError, match="do not match"):
        _run("ck3", groups=None)


def test_grouped_probe_missing_column_targeted_error(spark, sf_small):
    """ivf_probe(group_col=) on a per-cell table names the mismatch
    (r8 ADVICE) instead of a generic missing-column AnalysisException."""
    import pytest

    from apsviz_timeseriesdb_ingest_spark.llm.similarity import ivf_probe

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, centroid_id int")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    with pytest.raises(ValueError, match="no 'cell_group' column"):
        ivf_probe(corpus, [(9, [1.0, 0.1])], cents,
                  group_col="cell_group", groups=2)


def test_stateless_text_ops_compose_on_streams(spark, tmp_path):
    """chunk_documents / gopher_quality_stats / remove_repeated_lines
    are pure map-side (plus a repartition) — they must run unchanged on
    a streaming frame, and produce batch-identical rows."""
    from apsviz_timeseriesdb_ingest_spark.llm.text import (
        chunk_documents,
        gopher_quality_stats,
        remove_repeated_lines,
    )

    rows = [(1, EN), (2, "dup line here okay\ndup line here okay\n" + EN2)]
    src = str(tmp_path / "in")
    _write(spark, src, rows)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    batch = spark.createDataFrame(rows, SCHEMA)

    for name, op in (
            ("chunk", lambda d: chunk_documents(d, max_tokens=8, overlap=2)),
            ("gopher", gopher_quality_stats),
            ("lines", remove_repeated_lines)):
        out = str(tmp_path / f"out_{name}")
        q = (op(stream).writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120), name
        got = sorted(map(tuple, spark.read.parquet(out).collect()))
        expect = sorted(map(tuple, op(batch).collect()))
        assert got == expect, name
