"""Query-SERVING soak for the index-backed probe (r10): end-to-end
ANN serving at k = 1M with NO driver-held centroid list anywhere —
the path a 100 TB deployment actually runs:

1. a table-resident ``CentroidTable.from_frame`` over a synthetic 1M
   x dim centroid frame (spark.range expressions — the centroids never
   exist driver-side),
2. corpus assignment through the shuffled rung,
3. ``write_ann_layout`` with the bounded-group layout (G directories,
   geometry pinned in the sidecar),
4. ``ivf_probe((catalog, table), queries, index=table)`` — geometry
   from the pin, query cells from the distributed probe
   (``_probe_cells_via_index``: only |batch|·nprobe cells return).

Reports wall per stage, result rows, and driver RSS before/after the
serve stage — the flat-RSS claim for query time, matching the r9/r10
training-side soaks. One JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from apsviz_timeseriesdb_ingest_spark.llm.similarity import (  # noqa: E402
    CentroidTable,
    _norm,
    ivf_probe,
    write_ann_layout,
)
from apsviz_timeseriesdb_ingest_spark.session import get_spark  # noqa: E402
from apsviz_timeseriesdb_ingest_spark.sources.catalog import Catalog  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def synth_vec(col, dim: int):
    return F.array(*[(((col + 1) * (j * 2654435761 + 40503))
                      % 2000003 - 1000001).cast("double") / 1000001.0
                     for j in range(dim)])


def main() -> None:
    spark = get_spark("soak_index_probe")
    spark.sparkContext.setLogLevel("ERROR")
    k, dim, corpus_n, G = 1_000_000, 16, 50_000, 64

    cent_frame = spark.range(k).select(
        F.col("id").cast("int").alias("cid"),
        synth_vec(F.col("id"), dim).alias("cvec"))
    t0 = time.perf_counter()
    tbl = CentroidTable.from_frame(cent_frame, k=k, dim=dim, nprobe=2,
                                   coarse_k=4096)
    build_s = round(time.perf_counter() - t0, 2)

    # base half + duplicate twins (same vectors, offset ids): with
    # k ≫ corpus almost every cell holds ≤1 row, so twins guarantee
    # each query's probed cell contains a genuine neighbor — the
    # result-count assertion below is then meaningful, not vacuous
    base = spark.range(corpus_n // 2).select(
        F.col("id").alias("vec_id"),
        synth_vec(F.col("id") * 7 + 3, dim).alias("embedding"))
    twins = spark.range(corpus_n // 2).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        synth_vec(F.col("id") * 7 + 3, dim).alias("embedding"))
    corpus = (base.unionByName(twins)
              .withColumn("vec", F.col("embedding"))
              .withColumn("nrm", _norm(F.col("vec"))))
    t0 = time.perf_counter()
    assigned = (tbl.assign(corpus, id_col="vec_id")
                .withColumnRenamed("cell", "centroid_id"))
    layout = (corpus.select("vec_id", "embedding")
              .join(assigned.select("vec_id", "centroid_id"), "vec_id"))
    with tempfile.TemporaryDirectory() as wh:
        catalog = Catalog(spark, wh)
        write_ann_layout(catalog, layout, "ann", k=k,
                         partition_groups=G)
        layout_s = round(time.perf_counter() - t0, 2)

        queries = [(int(r.vec_id), [float(x) for x in r.embedding])
                   for r in spark.range(32).select(
                       F.col("id").alias("vec_id"),
                       synth_vec(F.col("id") * 7 + 3, dim)
                       .alias("embedding")).collect()]
        r0 = rss_mb()
        t0 = time.perf_counter()
        got = ivf_probe((catalog, "ann"), queries, index=tbl,
                        nprobe=2, top_k=5)
        n_rows = got.count()
        serve_s = round(time.perf_counter() - t0, 2)
        r1 = rss_mb()
    tbl.unpersist()
    print(json.dumps({
        "leg": "index_probe_serving", "k": k, "dim": dim,
        "corpus_rows": corpus_n, "partition_groups": G,
        "n_queries": len(queries), "from_frame_s": build_s,
        "assign_write_s": layout_s, "serve_s": serve_s,
        "result_rows": n_rows,
        "every_query_found_its_twin": n_rows >= len(queries),
        "rss_mb_before_serve": r0, "rss_mb_after_serve": r1,
        "rss_mb_delta_serve": round(r1 - r0, 1),
        "driver_centroid_list": tbl.centroids is None and "never",
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
