"""Run a SPARQL query (file or inline string) against a named-graph
store — the user-facing query entrypoint: a genegraph user's existing
``.sparql`` file runs against the Spark store unchanged.

The reference serves queries by compiling SPARQL text against its Jena
store (``database/query/resource.clj:201-239`` create-query + execute);
this is that surface for the batch engine: SELECT prints rows (TSV or
JSON lines), CONSTRUCT/DESCRIBE write a triples table (parquet) or
print, ASK prints true/false. ``--commit`` time-travels to an earlier
store snapshot; ``--param k=v`` pre-binds query variables (the
QuerySolutionMap path — ``--param pmbase=https://...``); ``--iri-param``
binds a value as an IRI term.

Usage:
    spark-submit --py-files genegraph_spark.zip scripts/run_sparql.py \
        --store /lake/kg-store query.sparql [--commit N] \
        [--param pmbase=https://pubmed.ncbi.nlm.nih.gov/] \
        [--out /lake/results.parquet] [--format tsv|jsonl] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", help="path to a .sparql file, or an inline query string")
    ap.add_argument("--store", required=True, help="named-graph store path")
    ap.add_argument("--commit", type=int, default=None, help="time-travel to commit N")
    ap.add_argument(
        "--param",
        action="append",
        default=[],
        metavar="K=V",
        help="pre-bind ?K to the literal V (repeatable)",
    )
    ap.add_argument(
        "--iri-param",
        action="append",
        default=[],
        metavar="K=V",
        help="pre-bind ?K to the IRI V (repeatable)",
    )
    ap.add_argument("--out", default=None, help="write result as parquet here instead of printing")
    ap.add_argument("--format", choices=["tsv", "jsonl"], default="tsv")
    ap.add_argument("--limit", type=int, default=100, help="max rows printed (not applied to --out)")
    args = ap.parse_args()

    text = (
        open(args.query).read()
        if os.path.exists(args.query) or args.query.endswith(".sparql")
        else args.query
    )

    from genegraph_spark.operators.sparql import PreparedQuery
    from genegraph_spark.session import get_spark
    from genegraph_spark.sinks.named_graph import NamedGraphStore

    params: dict = {}
    for kv in args.param:
        k, _, v = kv.partition("=")
        params[k] = v
    for kv in args.iri_param:
        k, _, v = kv.partition("=")
        params[k] = ("iri", v)

    q = PreparedQuery(text)  # parse before spinning up Spark: fail fast
    spark = get_spark("run_sparql")
    store = NamedGraphStore(spark, args.store)
    triples = store.triples(commit=args.commit) if args.commit is not None else store.triples()
    result = q.run(triples, **params)

    if isinstance(result, bool):  # ASK
        print(json.dumps({"ask": result}))
        return
    if args.out:
        result.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"written": args.out, "rows": spark.read.parquet(args.out).count()}))
        return
    rows = result.limit(args.limit).collect()
    cols = result.columns
    if args.format == "tsv":
        print("\t".join(cols))
        for r in rows:
            print("\t".join("" if r[c] is None else str(r[c]) for c in cols))
    else:
        for r in rows:
            print(json.dumps({c: r[c] for c in cols}, default=str))
    print(f"# {len(rows)} row(s) shown (limit {args.limit})", file=sys.stderr)


if __name__ == "__main__":
    main()
