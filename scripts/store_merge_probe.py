"""Store-scale MERGE probe (VERDICT r6 item 6): wall time of
NamedGraphStore.merge as the GRAPH COUNT grows at fixed rows/graph —
evidence for the partition-delete scaling claim (merge cost should
track the touched-bucket fraction + incoming rows, not total store
size).

Protocol: synthesize N graphs x R rows, merge into a fresh store
(commit 0), then merge an UPDATE batch touching 1% of graphs (commit 1)
— the incremental shape production takes. Best-of-1 (each store is
fresh; co-tenant noise bounded by reporting loadavg).

Usage: python scripts/store_merge_probe.py [graph_counts...]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from genegraph_spark.session import get_spark
    from genegraph_spark.sinks.named_graph import NamedGraphStore

    counts = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]
    rows_per_graph = 20
    spark = get_spark("store_merge_probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    def graphs_df(n: int, tag: str):
        return (
            spark.range(n * rows_per_graph)
            .select(
                F.concat(F.lit("urn:g"), (F.col("id") % n).cast("string")).alias("graph"),
                F.concat(F.lit("urn:s"), F.col("id").cast("string")).alias("subject"),
                F.lit(":p").alias("predicate"),
                F.concat(F.lit(tag), F.col("id").cast("string")).alias("object"),
                F.lit(False).alias("object_is_iri"),
                F.lit(None).cast("string").alias("object_datatype"),
            )
        )

    results = []
    for n in counts:
        d = tempfile.mkdtemp(prefix="gg_merge_probe_")
        try:
            store = NamedGraphStore(spark, os.path.join(d, "store"))
            load0 = open("/proc/loadavg").read().split()[0]
            t0 = time.time()
            store.merge(graphs_df(n, "v1-"))
            full_s = time.time() - t0
            upd = graphs_df(max(n // 100, 1), "v2-")
            t0 = time.time()
            store.merge(upd)
            incr_s = time.time() - t0
            load1 = open("/proc/loadavg").read().split()[0]
            results.append(
                {
                    "graphs": n,
                    "rows": n * rows_per_graph,
                    "full_merge_s": round(full_s, 2),
                    "incremental_1pct_merge_s": round(incr_s, 2),
                    "loadavg": [load0, load1],
                }
            )
            print(json.dumps(results[-1]))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"probe": "store_merge", "rows_per_graph": rows_per_graph, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
