"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query sec),
"sf", "throughput", "scaling"}.

Scaling evidence (north rule: ≥0.8 throughput scaling efficiency from N
to 4N executors — no real cluster in the sandbox, so the same job runs at
local[8] and local[32] on the same input, in separate JVMs): the KG
pipeline over a replicated pages table (replication raises work per core
so task time dominates fixed overhead, the regime a real cluster runs
in). Efficiency = (t_N / t_4N) / 4.

Skip the scaling subprocesses with SPARK_GRAFT_SKIP_SCALING=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "20"))

BENCH_QUERIES = [
    "kg_triples",
    "kg_linked_mentions",
    "alg_bgp_join",
    "alg_transitive_closure",
    "tpch_q1",
    "tpch_q3_revenue",
    "win_running_total",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "sim_topk",
    "text_stats",
]


def replicated_pages(spark, sf_dir: str, factor: int):
    """Deterministically replicate the pages table ``factor``× with
    distinct urls/doc_ids (scaling workload)."""
    from pyspark.sql import functions as F

    from genegraph_spark import fixtures

    pages = fixtures.pages_df(spark, sf_dir)
    reps = spark.range(factor).select(F.col("id").alias("_r"))
    return (
        pages.crossJoin(reps)
        .withColumn("url", F.concat("url", F.lit("&r="), F.col("_r").cast("string")))
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * 1_000_000)
        .drop("_r")
    )


def kg_pipeline_job(spark, sf_dir: str, factor: int) -> int:
    """The scaling workload: full KG construction (real pandas-UDF
    extraction) over the replicated pages; noop sink. Returns pages
    processed."""
    from genegraph_spark.plans.pipeline import construct_kg

    pages = replicated_pages(spark, sf_dir, factor)
    n_pages = pages.count()
    res = construct_kg(spark, sf_dir, pages=pages)
    res.triples.write.format("noop").mode("overwrite").save()
    return n_pages


def scaling_worker(cores: int) -> None:
    """Child process: run the scaling job at local[cores], print JSON."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from genegraph_spark.session import get_spark

    spark = get_spark(f"bench_scale_{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    # warm up JVM/Python workers outside the timed section
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.time()
    n = kg_pipeline_job(spark, SF_DIR, REPL)
    dt = time.time() - t0
    print(json.dumps({"cores": cores, "sec": dt, "pages": n, "pages_per_sec": n / dt}))
    spark.stop()


def run_scaling() -> dict:
    out = {}
    for cores in (8, 32):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker", str(cores)],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out[f"local[{cores}]"] = json.loads(line)
    t8, t32 = out["local[8]"]["sec"], out["local[32]"]["sec"]
    out["speedup_8_to_32"] = t8 / t32
    out["scaling_efficiency"] = (t8 / t32) / 4.0
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-worker":
        scaling_worker(int(sys.argv[2]))
        return

    import __spark_entry__ as E
    from genegraph_spark.session import get_spark

    spark = get_spark("bench")
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup

    qs = E.queries()
    per_query: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt

    # throughput of the full pipeline at bench scale
    t0 = time.time()
    n_pages = kg_pipeline_job(spark, SF_DIR, REPL)
    pipe_dt = time.time() - t0
    throughput = {
        "pipeline_pages": n_pages,
        "pipeline_sec": round(pipe_dt, 3),
        "pages_per_sec": round(n_pages / pipe_dt, 1),
    }
    spark.stop()

    scaling = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        scaling = run_scaling()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf),
                "throughput": throughput,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
