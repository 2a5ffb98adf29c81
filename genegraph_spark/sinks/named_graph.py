"""Named-graph-partitioned triple store with replace-by-graph merge,
per-commit lineage, and resume.

Reference analog: the Jena TDB2 named-graph dataset —
``replaceNamedModel`` upserts a whole graph atomically and
``removeNamedModel`` deletes it (``src/genegraph/database/load.clj:72-87``,
``sink/event.clj:23-46``); lineage via the event recorder
(``sink/event_recorder.clj:25-62``) and offset persistence
(``sink/stream.clj:221-236``) make a killed run resumable.

Spark-first design: the store is a parquet table partitioned by
``bucket = pmod(xxhash64(graph), n_buckets)``. A merge rewrites only the
buckets touched by incoming graphs: read-side we anti-join the existing
rows of those buckets against the incoming graph set, union the incoming
rows, and dynamic-partition-overwrite just those buckets. At cluster
scale this maps 1:1 onto Iceberg ``MERGE INTO triples USING new ON
t.graph = n.graph WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT``
partitioned by ``bucket(graph, N)`` — the parquet implementation keeps
the exact graph-granularity replace semantics the reference has, without
requiring Iceberg jars in the sandbox.

Why whole-graph replace (not row upsert): the reference's idempotence
story depends on it — replaying an event produces the same graph, so a
resumed/duplicated write converges. Ours is identical: merges are
idempotent because the incoming graph's rows fully determine the graph.

Lineage: every commit writes ``_lineage/commit=<id>`` rows
``(graph, n_triples, action)`` plus a ``_commits`` manifest. Resume =
``committed_graphs()`` anti-join before reprocessing.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_SCHEMA = (
    "graph string, subject string, predicate string, object string, "
    "object_is_iri boolean, object_datatype string"
)


class NamedGraphStore:
    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        self._data = os.path.join(path, "data")
        self._lineage = os.path.join(path, "lineage")
        self._commits = os.path.join(path, "commits.jsonl")

    # -- helpers ----------------------------------------------------------
    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn("bucket", F.pmod(F.xxhash64("graph"), F.lit(self.n_buckets)))

    def exists(self) -> bool:
        return os.path.exists(self._data)

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], TRIPLE_SCHEMA + ", bucket bigint")
        return self.spark.read.parquet(self._data)

    def triples(self) -> DataFrame:
        """The union model: all named graphs (query.clj:15-16 analog)."""
        return self.read().drop("bucket")

    # -- write paths -------------------------------------------------------
    def merge(self, triples: DataFrame, delete_graphs: DataFrame | None = None) -> dict:
        """Replace every incoming graph's content; optionally delete graphs.

        ``triples``: TRIPLE_SCHEMA rows. ``delete_graphs``: one column
        ``graph``. Returns commit metadata.
        """
        new = self._bucket(triples)
        incoming_graphs = new.select("graph").distinct()
        if delete_graphs is not None:
            incoming_graphs = incoming_graphs.union(delete_graphs.select("graph")).distinct()
        incoming_graphs = self._bucket(incoming_graphs)

        if self.exists():
            touched = [r["bucket"] for r in incoming_graphs.select("bucket").distinct().collect()]
            existing = self.read().where(F.col("bucket").isin(touched))
            keep = existing.join(incoming_graphs.select("graph"), "graph", "left_anti")
            out = keep.unionByName(new)
            writer = out.repartition("bucket").write.partitionBy("bucket").mode("overwrite")
            # dynamic overwrite: only touched bucket partitions are replaced
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            writer.parquet(self._data)
        else:
            self._bucket(triples).repartition("bucket").write.partitionBy("bucket").mode(
                "overwrite"
            ).parquet(self._data)

        commit = self._record_lineage(triples, delete_graphs)
        return commit

    def delete_graphs(self, graphs: DataFrame) -> dict:
        """Unpublish: remove graphs entirely (sink/event.clj:41-46)."""
        empty = self.spark.createDataFrame([], TRIPLE_SCHEMA)
        return self.merge(empty, delete_graphs=graphs)

    # -- lineage / resume ---------------------------------------------------
    def _record_lineage(self, triples: DataFrame, delete_graphs: DataFrame | None) -> dict:
        commit_id = self._next_commit_id()
        lin = triples.groupBy("graph").agg(F.count("*").alias("n_triples")).withColumn(
            "action", F.lit("publish")
        )
        if delete_graphs is not None:
            lin = lin.unionByName(
                delete_graphs.select("graph")
                .distinct()
                .withColumn("n_triples", F.lit(0))
                .withColumn("action", F.lit("unpublish"))
            )
        lin.write.mode("overwrite").parquet(os.path.join(self._lineage, f"commit={commit_id}"))
        meta = {
            "commit": commit_id,
            "wall_ts": time.time(),
        }
        with open(self._commits, "a") as f:
            f.write(json.dumps(meta) + "\n")
        return meta

    def _next_commit_id(self) -> int:
        if not os.path.exists(self._commits):
            return 0
        with open(self._commits) as f:
            lines = [ln for ln in f if ln.strip()]
        return (max(json.loads(ln)["commit"] for ln in lines) + 1) if lines else 0

    def lineage(self) -> DataFrame:
        return self.spark.read.option("basePath", self._lineage).parquet(
            os.path.join(self._lineage, "commit=*")
        )

    def committed_graphs(self) -> DataFrame:
        """Graphs whose latest lineage action is publish — the resume set."""
        from pyspark.sql import Window

        lin = self.lineage()
        w = Window.partitionBy("graph").orderBy(F.desc("commit"))
        return (
            lin.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("action") == "publish"))
            .select("graph")
        )
