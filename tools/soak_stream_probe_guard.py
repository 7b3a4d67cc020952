"""Streaming probe scale-guard soak (r8 verdict task 5 'done'
criterion): measure the embedding stream's SECOND micro-batch — the
one that probes the existing corpus — as the number of distinct
probed cells grows, on both sides of ``probe_literal_max``:

- literal path (bound above the batch): the distinct probed cells are
  collected and become a literal ``isin`` — static pruning, but the
  driver round-trip and the predicate itself grow with
  |batch|·nprobe;
- semi-join path (bound forced to 0): the cell predicate is a
  broadcast LEFT SEMI join against the (tiny) probed-cells frame —
  per-batch driver cost bounded at ``probe_literal_max+1`` rows
  whatever the batch size, while the ≤G ``cell_group`` directory
  filter stays literal.

Semantics are pinned identical in pytest
(test_embedding_stream_semi_join_probe_and_layout_pin); this soak
records the COST shape: per-batch wall seconds at two batch sizes per
path, plus the corpus row counts (must match pairwise). One JSON line
per leg.
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
    CentroidIndex)
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.sources.catalog import (  # noqa: E402
    Catalog)
from apsviz_timeseriesdb_ingest_spark.streaming.corpus_stream import (  # noqa: E402
    run_incremental_embedding_stream)

DIM = 8
K = 2000
G = 8


def unit(v):
    import math
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def main() -> None:
    spark = get_spark("soak_probe_guard")
    spark.sparkContext.setLogLevel("ERROR")
    r = random.Random(11)
    cents = [unit([r.gauss(0, 1) for _ in range(DIM)]) for _ in range(K)]
    idx = CentroidIndex(cents)

    for batch_rows in (500, 4000):
        for label, lit_max in (("literal", 10**9), ("semi", 0)):
            tmp = tempfile.mkdtemp(prefix="probe_guard_")
            src = f"{tmp}/in"
            catalog = Catalog(spark, f"{tmp}/wh")

            def write(rows):
                spark.createDataFrame(
                    rows, "vec_id long, embedding array<float>") \
                    .coalesce(4).write.mode("append").parquet(src)

            def run(ck):
                q = run_incremental_embedding_stream(
                    spark, src, catalog, cents,
                    checkpoint_dir=f"{tmp}/{ck}", threshold=0.999,
                    nprobe=2, dim=DIM, index=idx, partition_groups=G,
                    probe_literal_max=lit_max)
                assert q.awaitTermination(300)

            # batch 1 populates the corpus (no probe yet)
            write([(i, unit([r.gauss(0, 1) for _ in range(DIM)]))
                   for i in range(batch_rows)])
            run("ck")
            # batch 2 probes the stored corpus — the measured leg
            write([(100_000 + i, unit([r.gauss(0, 1) for _ in range(DIM)]))
                   for i in range(batch_rows)])
            t0 = time.perf_counter()
            run("ck")
            wall = round(time.perf_counter() - t0, 2)
            n = catalog.read("ann_corpus").count()
            print(json.dumps({
                "leg": "stream_probe", "path": label,
                "batch_rows": batch_rows, "k": K, "nprobe": 2,
                "probe_batch_s": wall, "corpus_rows": n,
            }), flush=True)
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
