"""Streaming large-k soak (r7 verdict task 5): the batch at-scale leg
(20k x 64d, k=2000) is measured in tools/soak_centroid_k.py — this
drives `run_incremental_embedding_stream(index=)` at the same scale
across MANY micro-batches and checks the two properties the batch soak
cannot:

1. **Per-batch cost flat in k**: the same 8-file backlog
   (20k vectors, 2.5k/batch via max_files_per_trigger=1) runs at
   k = 500 / 2000 / 8000; mean per-batch wall must not grow with k
   (the plan is constant-size, the per-row candidate width is
   O(nprobe·k/coarse_k) ≈ O(sqrt(k)) — sub-linear; at these k the
   corpus probe + LSH verify dominate).
2. **The persisted index frame survives storage loss**: after a few
   batches the soak UNPERSISTS the stream-lifetime frame mid-run
   (harsher than losing one executor's blocks — all replicas gone);
   later batches must recompute it from the driver-held rows and
   finish with zero recall loss. This is exactly the property the r7
   self-review chose persist() over localCheckpoint() for (a
   checkpointed block is non-replicated truncated-lineage storage —
   one lost executor would kill every later batch).

Recall oracle: each file b>0 opens with 100 exact scalar-multiple
duplicates of file b-1's vectors (same direction → same cell, cosine
1.0) under fresh ids — all 700 must be rejected cross-batch; the other
19,300 random 64-d gaussians are mutually near-orthogonal and must all
land. One JSON line per (k) leg with per-batch wall seconds.
"""

from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.similarity import (  # noqa: E402
    CentroidIndex,
)
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (  # noqa: E402
    run_incremental_embedding_stream,
)

DIM = 64
BATCHES = 8
PER_BATCH = 2500
DUPS_PER_BATCH = 100
#: (k, partition_groups) legs. The ungrouped k-sweep measures the
#: small-files growth (per-batch cost grew ~sqrt(k): 30.7 / 60.5 /
#: 123.3 s at k=500/2000/8000 — the dynamic-partition write fans out
#: to ~|batch| tiny files in as many directories, and batch 1, which
#: has NO corpus probe, already shows the growth, so it is the WRITE
#: fanout + later read fanout, not assignment). The grouped leg pins
#: the fix: cell_group = cid div ceil(k/G) bounds directories at G
#: with contiguous cell ranges (probe keeps two pruning levels).
LEGS = [(500, None), (2000, None), (8000, None), (8000, 256)]
UNPERSIST_AFTER_BATCH = 3


def _mk_batches(rng: random.Random) -> list[list[tuple[int, list[float]]]]:
    out, prev = [], None
    next_id = 0
    for b in range(BATCHES):
        rows = []
        if prev is not None:
            for i in range(DUPS_PER_BATCH):
                rows.append((next_id, [x * 1.001 for x in prev[i][1]]))
                next_id += 1
        while len(rows) < PER_BATCH:
            rows.append((next_id,
                         [rng.gauss(0, 1) for _ in range(DIM)]))
            next_id += 1
        out.append(rows)
        prev = rows[DUPS_PER_BATCH:] if b else rows
    return out


def main() -> None:
    spark = get_spark("soak-embedding-stream-k")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(23)
    batches = _mk_batches(rng)
    n_total = sum(len(b) for b in batches)
    n_dups = DUPS_PER_BATCH * (BATCHES - 1)

    for k, groups in LEGS:
        cents = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(k)]
        idx = CentroidIndex(cents, iters=4)
        work = tempfile.mkdtemp(prefix=f"stream-k{k}-g{groups}-")
        src, wh, ck = (f"{work}/in", f"{work}/wh", f"{work}/ck")
        catalog = Catalog(spark, wh)
        SCH = "vec_id long, embedding array<float>"
        for b in batches:
            spark.createDataFrame(b, SCH).coalesce(1) \
                .write.mode("append").parquet(src)
        t0 = time.perf_counter()
        q = run_incremental_embedding_stream(
            spark, src, catalog, cents, checkpoint_dir=ck,
            threshold=0.95, nprobe=2, dim=DIM, index=idx,
            max_files_per_trigger=1, partition_groups=groups)
        # storage-loss injection: drop every cached block of the
        # stream-lifetime index frame mid-run; later micro-batches must
        # recompute it from the driver-held rows
        frame = q._graft_index_frame
        injected = False
        while q.isActive:
            done = len([p for p in q.recentProgress
                        if p["numInputRows"] > 0])
            if not injected and done >= UNPERSIST_AFTER_BATCH:
                frame.unpersist(blocking=True)
                injected = True
            time.sleep(0.2)
        q.awaitTermination(10)
        wall = time.perf_counter() - t0
        assert injected, "stream finished before the storage-loss probe"
        per_batch = [round(p["batchDuration"] / 1000.0, 3)
                     for p in q.recentProgress if p["numInputRows"] > 0]
        kept = catalog.read("ann_corpus").count()
        ok = (kept == n_total - n_dups)
        print(json.dumps({
            "k": k, "partition_groups": groups,
            "batches": len(per_batch), "n_in": n_total,
            "kept": kept, "expected": n_total - n_dups,
            "recall_ok": ok, "wall_sec": round(wall, 2),
            "mean_batch_sec": round(sum(per_batch) / len(per_batch), 3),
            "per_batch_sec": per_batch,
        }), flush=True)
        assert ok, f"recall loss at k={k}: kept {kept}"
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
