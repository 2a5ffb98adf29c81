"""Extra benchmarks for the optimization round (bench.py is frozen).

Per-query phase profile: splits each bench query's wall time into
  - t_build : Python-side DataFrame construction (expression building)
  - t_plan  : Catalyst analysis + optimization + physical planning
              (forcing ``queryExecution().executedPlan()``)
  - t_exec  : noop-sink execution (guide §1.4), which still includes
              codegen + task run but not the sink
and records best-of-N of the total alongside, so numbers line up with
bench.py's methodology. Also dumps ``.explain("formatted")`` per query.

Usage:
    python bench_extra.py [--queries a,b,c] [--reps 2] [--plans-dir plans/r07 --suffix _before]
Prints one JSON line per query and a total summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "kg_triples", "kg_linked_mentions", "alg_bgp_join",
    "alg_transitive_closure", "tpch_q1", "tpch_q3_revenue",
    "win_running_total", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_embedding_lsh", "dedup_cluster_reps", "sim_topk", "sim_pq_topk",
    "text_stats", "text_corpus_filter", "kg_jsonld_docs",
    "join_asof_descriptor", "alg_sparql_select", "dedup_spans",
    "graph_pagerank", "text_decontaminate", "kg_dosage_jira",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else BENCH_QUERIES

    import __spark_entry__ as E
    from genegraph_spark.session import get_spark

    spark = get_spark("bench_extra")
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    qs = E.queries()

    with open("/proc/loadavg") as f:
        load0 = f.read().split()[:3]

    results: dict[str, dict] = {}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            cur = {
                "t_build": round(t1 - t0, 3),
                "t_plan": round(t2 - t1, 3),
                "t_exec": round(t3 - t2, 3),
                "t_total": round(t3 - t0, 3),
            }
            prev = results.get(name)
            if prev is None or cur["t_total"] < prev["t_total"]:
                results[name] = cur
            if rep == 0 and args.plans_dir:
                os.makedirs(args.plans_dir, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan)
            spark.sparkContext.setJobDescription(None)

    with open("/proc/loadavg") as f:
        load1 = f.read().split()[:3]

    for name in names:
        print(json.dumps({"query": name, **results[name]}))
    total = round(sum(r["t_total"] for r in results.values()), 3)
    print(json.dumps({
        "metric": "bench_extra_total_sec", "value": total,
        "t_build": round(sum(r["t_build"] for r in results.values()), 3),
        "t_plan": round(sum(r["t_plan"] for r in results.values()), 3),
        "t_exec": round(sum(r["t_exec"] for r in results.values()), 3),
        "loadavg_before": load0, "loadavg_after": load1,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
