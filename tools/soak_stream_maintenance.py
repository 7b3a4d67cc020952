"""Composed long-run soak: incremental dedup STREAM + periodic
MAINTENANCE + alert POLLING + injected crashes, all against one table
family (r6 verdict task 5 — the pieces are individually tested; this
exercises their composition over enough batches that compaction,
orphan vacuum, sidecar refresh, snapshot reads, and the alert cursor
all fire while the stream keeps ingesting).

Timeline (CYCLES batches):
- each cycle writes a fresh input file (mostly-unique docs + one
  near-duplicate of an earlier doc + every 3rd cycle a dup-flood that
  trips the drift alert) and drives ``run_incremental_dedup_stream``
  with stats+alerts under the commit-ledger txn protocol;
- every MAINT_EVERY cycles, ``maintain_tables`` runs over the corpus +
  index + stats + alerts family (fence=True — the maintenance lease
  fences the stream writer; the next cycle's stream restart
  re-acquires, which is the documented operational pattern);
- CRASH CYCLES inject (a) an uncommitted orphan partition (a writer
  that died between its data write and its ledger commit) and (b) a
  maintenance pass whose compact aborts mid-run (exception between
  vacuum and compact) leaving the family readable;
- after every cycle the invariants are re-checked: committed corpus ==
  the serially-expected accepted set (ZERO recall/visibility loss),
  a snapshot read pinned at an early batch stays bit-stable, and the
  alert poller's since_batch cursor sees each alert exactly once.

Prints one JSON line per cycle (wall seconds split ingest/maintenance,
file counts, alert count) and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.incremental import (  # noqa: E402
    build_dedup_index,
    commits_table,
)
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.sources.catalog import (  # noqa: E402
    Catalog,
    maintain_tables,
)
from apsviz_timeseriesdb_ingest_spark.sources.zonemap import (  # noqa: E402
    list_parquet_files,
)
from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (  # noqa: E402
    committed_alerts,
    committed_corpus,
    run_incremental_dedup_stream,
)

LSH = dict(k=2, num_hashes=16, bands=8)
CYCLES = 12
MAINT_EVERY = 4
ORPHAN_CYCLES = {5, 9}
MAINT_CRASH_CYCLES = {7}  # must be maintenance cycles ((c+1)%MAINT_EVERY==0)
DOCS_PER_CYCLE = 40


def _doc_text(i: int) -> str:
    # stride 37 > 30 words/doc: token ranges are DISJOINT across ids,
    # so distinct docs are never near-duplicates of each other
    return " ".join(f"w{i * 37 + j}" for j in range(30))


def main() -> None:
    import tempfile

    spark = get_spark("soak-stream-maint")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak_stream_maint_")
    catalog = Catalog(spark, os.path.join(root, "wh"))
    src = os.path.join(root, "in")
    os.makedirs(src)
    ledger = commits_table("minhash_index")
    families = {t: ledger for t in
                ("stream_corpus", "minhash_index", "stats", "alerts")}

    seed = spark.createDataFrame([(0, _doc_text(0))],
                                 "doc_id long, text string")
    build_dedup_index(catalog, seed, stream_index=True, **LSH)

    expected_ids: set[int] = set()
    alert_cursor = -1
    alerts_seen = 0
    snapshot_pin = None
    next_id = 1
    summary = []
    for cycle in range(CYCLES):
        rows = []
        for _ in range(DOCS_PER_CYCLE):
            rows.append((next_id, _doc_text(next_id)))
            expected_ids.add(next_id)
            next_id += 1
        # one exact duplicate of an old doc (must be rejected) and, on
        # flood cycles, a burst of one repeated doc (drift signal)
        rows.append((next_id, _doc_text(1)))
        next_id += 1
        if cycle % 3 == 2:
            flood_first = next_id
            for _ in range(10):
                rows.append((next_id, "zap zap zap zap zap zap"))
                next_id += 1
            if cycle == 2:
                # only the FIRST flood's batch-dedup survivor is new to
                # the corpus; later floods are rejected by the index
                expected_ids.add(flood_first)
        batch_dir = os.path.join(src, f"b{cycle}")
        (spark.createDataFrame(rows, "doc_id long, text string")
         .coalesce(1).write.parquet(batch_dir))

        if cycle in ORPHAN_CYCLES:
            # (a) a writer that died pre-commit: orphan partition with a
            # batch id far above the stream's epoch counter
            orphan = (spark.createDataFrame(
                [(999_000 + cycle, "orphan text never committed")],
                "doc_id long, text string")
                .withColumn("__batch", F.lit(9_000 + cycle).cast("long"))
                .withColumn("__writer", F.lit("crashed")))
            catalog.append(orphan, "stream_corpus",
                           partition_by=["__batch", "__writer"])

        t0 = time.perf_counter()
        q = run_incremental_dedup_stream(
            spark, os.path.join(src, "b*"), catalog,
            checkpoint_dir=os.path.join(root, "ck"),
            stats_table="stats", alerts_table="alerts", **LSH)
        q.processAllAvailable()
        q.stop()
        ingest_s = time.perf_counter() - t0

        committed = {b for b, _ in catalog.committed_batches(ledger)}
        if snapshot_pin is None and len(committed) >= 2:
            snapshot_pin = max(committed)
            snap0 = sorted(r.doc_id for r in committed_corpus(
                catalog, "stream_corpus",
                as_of_batch=snapshot_pin).select("doc_id").collect())

        maint_s = 0.0
        maint = None
        if (cycle + 1) % MAINT_EVERY == 0:
            t0 = time.perf_counter()
            if cycle in MAINT_CRASH_CYCLES:
                # (b) maintenance that dies mid-pass: vacuum runs, then
                # the compact aborts — family must stay fully readable
                real_compact = Catalog.compact

                def boom(self, table, **kw):
                    raise RuntimeError("injected mid-maintenance crash")

                Catalog.compact = boom
                try:
                    maintain_tables(catalog, families)
                except RuntimeError:
                    pass
                finally:
                    Catalog.compact = real_compact
            maint = maintain_tables(catalog, families)
            maint_s = time.perf_counter() - t0

        # ---- invariants, every cycle ------------------------------
        got = sorted(r.doc_id for r in committed_corpus(
            catalog, "stream_corpus").select("doc_id").collect())
        assert got == sorted(expected_ids), (
            f"cycle {cycle}: visibility/recall loss: "
            f"{len(got)} vs {len(expected_ids)}")
        if snapshot_pin is not None:
            snap_now = sorted(r.doc_id for r in committed_corpus(
                catalog, "stream_corpus",
                as_of_batch=snapshot_pin).select("doc_id").collect())
            assert snap_now == snap0, f"cycle {cycle}: snapshot drifted"
        fresh = committed_alerts(catalog, since_batch=alert_cursor)
        new_alerts = fresh.count()
        if new_alerts:
            alert_cursor = max(r["__batch"] for r in
                               fresh.select("__batch").collect())
            alerts_seen += new_alerts
        rec = {"cycle": cycle, "ingest_sec": round(ingest_s, 2),
               "maint_sec": round(maint_s, 2),
               "corpus_files": len(list_parquet_files(
                   catalog.path("stream_corpus"))),
               "docs": len(got), "new_alerts": new_alerts,
               "maintained": bool(maint)}
        summary.append(rec)
        print(json.dumps(rec), flush=True)

    # orphans from the crash cycles were reclaimed by maintenance
    leftover = [d for d in os.listdir(catalog.path("stream_corpus"))
                if d.startswith("__batch=90")]
    assert not leftover, f"orphans not reclaimed: {leftover}"
    print(json.dumps({
        "cycles": CYCLES, "final_docs": len(expected_ids),
        "alerts_total": alerts_seen,
        "orphan_partitions_left": len(leftover),
        "avg_ingest_sec": round(sum(r["ingest_sec"] for r in summary)
                                / len(summary), 2),
        "avg_maint_sec": round(sum(r["maint_sec"] for r in summary
                                   if r["maintained"])
                               / max(1, sum(r["maintained"]
                                            for r in summary)), 2),
        "result": "OK"}), flush=True)


if __name__ == "__main__":
    main()
