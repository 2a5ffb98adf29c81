"""Physical-plan audit for the headline queries: prints join/exchange/
codegen/Python-stage counts and pushed filters per query, so plan
regressions (SortMergeJoin where a broadcast belongs, duplicated Python
stages, missing pushdown) are visible at a glance.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
The invariants worth keeping are locked in tests/test_round2.py
(plan-shape tests); this script is the exploratory view.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "kg_triples", "kg_linked_mentions", "kg_mentions_preferred",
    "dedup_minhash_pairs", "dedup_embedding_lsh", "sim_topk", "sim_ivf_topk",
    "tpch_q3_revenue", "join_asof_descriptor", "kg_jsonld_docs",
    "text_corpus_filter", "alg_describe", "cur_disease_subtree",
    # round 4
    "alg_sparql_select", "alg_sparql_agg", "kg_nested_shapes",
    "kg_rdfxml_docs", "dedup_spans", "dedup_cluster_reps",
    "text_decontaminate",
    # round 5
    "cur_actionability_assertions",
    # round 5 session 6
    "kg_event_analysis", "text_lm_filter", "cur_cv_members_timeseries",
    "kg_cv_class_context",
    # round 6
    "dedup_incremental", "snap_export", "alg_text_search_bm25",
    "text_vocabulary", "win_ntile",
]

MARKERS = [
    "Exchange", "BroadcastExchange", "BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "WholeStageCodegen", "InMemoryTableScan", "MapInPandas", "ArrowEval",
    "TakeOrderedAndProject",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT

    import __spark_entry__ as E
    from genegraph_spark.session import get_spark

    spark = get_spark("explain_audit")
    qs = E.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {m: plan.count(m) for m in MARKERS}
        print(name, {k: v for k, v in counts.items() if v})
        for m in sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]", plan))):
            if m != "PushedFilters: []":
                print("   ", m[:160])
    spark.stop()


if __name__ == "__main__":
    main()
