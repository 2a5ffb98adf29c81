"""Named-graph store semantics: replace-by-graph merge, unpublish,
idempotent resume — the create/update/delete sequence test (FIXTURES §5;
reference analog: one-variation-create-update-delete fixtures and
replaceNamedModel semantics, database/load.clj:72-87)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genegraph_spark.sinks.named_graph import TRIPLE_SCHEMA, NamedGraphStore


def t(graph, s, p, o, is_iri=True, dt=None):
    return (graph, s, p, o, is_iri, dt)


def make(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_create_update_delete_sequence(spark, tmp_path):
    store = NamedGraphStore(spark, str(tmp_path / "store"), n_buckets=8)

    # create: two graphs
    c1 = make(spark, [t("g1", "s1", "p", "o1"), t("g1", "s1", "p", "o2"), t("g2", "s2", "p", "o1")])
    store.merge(c1)
    assert store.triples().count() == 3

    # update: g1 replaced wholesale (shrinks to one triple); g2 untouched
    c2 = make(spark, [t("g1", "s1", "p", "o3")])
    store.merge(c2)
    got = {(r["graph"], r["object"]) for r in store.triples().collect()}
    assert got == {("g1", "o3"), ("g2", "o1")}

    # idempotent replay (resume semantics: same merge converges)
    store.merge(c2)
    got2 = {(r["graph"], r["object"]) for r in store.triples().collect()}
    assert got2 == got

    # delete: unpublish g1
    store.delete_graphs(make(spark, [t("g1", "x", "x", "x")]).select("graph"))
    got3 = {(r["graph"], r["object"]) for r in store.triples().collect()}
    assert got3 == {("g2", "o1")}

    # lineage shows the full history; resume set excludes unpublished g1
    lin = store.lineage()
    assert lin.where("graph = 'g1'").count() == 4  # publish, publish, publish, unpublish
    committed = {r["graph"] for r in store.committed_graphs().collect()}
    assert committed == {"g2"}


def test_merge_only_rewrites_touched_buckets(spark, tmp_path):
    store = NamedGraphStore(spark, str(tmp_path / "store2"), n_buckets=64)
    many = make(spark, [t(f"g{i}", "s", "p", f"o{i}") for i in range(200)])
    store.merge(many)
    # single-graph update touches exactly one bucket
    one = make(spark, [t("g7", "s", "p", "NEW")])
    store.merge(one)
    got = {r["object"] for r in store.triples().where(F.col("graph") == "g7").collect()}
    assert got == {"NEW"}
    assert store.triples().count() == 200


def test_pipeline_to_store_and_resume(spark, sf_dir, tmp_path):
    """Full batch run lands in the store; a resumed (replayed) run
    converges to the same state; time travel sees the prior snapshot."""
    from genegraph_spark.plans.pipeline import run_to_store

    path = str(tmp_path / "kg")
    res, store, commit = run_to_store(spark, sf_dir, path, use_golden_text=True)
    n1 = store.triples().count()
    assert n1 > 0
    live_graphs = {r["graph"] for r in store.committed_graphs().collect()}
    deleted = {r["graph"] for r in res.deleted_graphs.collect()}
    assert deleted and not (live_graphs & deleted)

    # replay (simulates resume after kill mid-run): state converges
    res2, store2, commit2 = run_to_store(spark, sf_dir, path, use_golden_text=True)
    assert store2.triples().count() == n1
    a = {tuple(r) for r in store2.triples().collect()}
    b = {tuple(r) for r in store2.triples(commit=commit["commit"]).collect()}
    assert a == b
