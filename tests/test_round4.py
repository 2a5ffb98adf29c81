"""Round-4 additions: atomic stale-lock reclaim, cluster-reps plan shape,
nested SHACL node shapes, RDF/XML round trip, assertion-backed resolvers."""

from __future__ import annotations

import multiprocessing as mp
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Single-writer lock: concurrent reclaim of a dead writer's lock
# ---------------------------------------------------------------------------


def _reclaim_worker(store_path, barrier, hold, results, idx):
    """Try to acquire commit 0's lock (left by a 'dead' writer); winner
    holds until told to release so losers must observe a LIVE holder."""
    from genegraph_spark.sinks.named_graph import NamedGraphStore

    store = NamedGraphStore.__new__(NamedGraphStore)
    store.path = store_path
    barrier.wait()
    try:
        with store._commit_lock(0):
            results[idx] = "won"
            hold.wait()
    except RuntimeError:
        results[idx] = "lost"


class TestLockReclaimRace:
    def test_exactly_one_reclaimer_wins(self, tmp_path):
        """Two live writers racing to reclaim a dead-pid lock: exactly one
        must win; the loser must see the winner's LIVE lock and raise
        (the pre-r4 remove-then-rewrite let both proceed)."""
        store_path = str(tmp_path / "store")
        os.makedirs(store_path)
        with open(os.path.join(store_path, "commit-00000000.lock"), "w") as f:
            f.write("999999999")  # dead pid
        ctx = mp.get_context("fork")
        n = 4
        barrier = ctx.Barrier(n)
        hold = ctx.Event()
        results = ctx.Manager().dict()
        procs = [
            ctx.Process(
                target=_reclaim_worker, args=(store_path, barrier, hold, results, i)
            )
            for i in range(n)
        ]
        for p in procs:
            p.start()
        # wait until every process reports a result (winner reports while
        # still holding the lock)
        import time

        deadline = time.time() + 30
        while len(results) < n and time.time() < deadline:
            time.sleep(0.05)
        hold.set()
        for p in procs:
            p.join(timeout=30)
        outcomes = sorted(results.values())
        assert outcomes == ["lost", "lost", "lost", "won"], outcomes
        # winner released: lock gone
        assert not os.path.exists(os.path.join(store_path, "commit-00000000.lock"))


# ---------------------------------------------------------------------------
# cluster_representatives: no broadcast of the per-cluster reps frame
# ---------------------------------------------------------------------------


class TestClusterRepsPlan:
    def test_no_broadcast_exchange(self, spark):
        """The reps side is corpus-scale (one row per near-dup cluster);
        the r3 plan broadcast it (VERDICT r3 #3). The r4 plan computes
        rep_id with F.first over the cluster window — assert the physical
        plan has no BroadcastExchange at all and exactly one window."""
        from genegraph_spark.operators.dedup import cluster_representatives

        docs = spark.createDataFrame(
            [(i, "text" + "x" * (i % 5)) for i in range(20)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 18, 2)], "id_a long, id_b long"
        )
        out = cluster_representatives(docs, pairs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastExchange") == 0, plan
        # the reps join is gone entirely: rep_id comes from ONE window
        assert plan.count("Window [") == 1, plan
        assert "first(doc_id" in plan
        # correctness: one kept representative per cluster, longest text wins
        rows = out.collect()
        clusters = {}
        for r in rows:
            clusters.setdefault(r.cluster, []).append(r)
        for cl, members in clusters.items():
            keeps = [m for m in members if m.keep]
            assert len(keeps) == 1
            assert all(m.rep_id == keeps[0].doc_id for m in members)


# ---------------------------------------------------------------------------
# Nested node shapes (sh:node)
# ---------------------------------------------------------------------------

TRIPLE_SCHEMA = (
    "graph string, subject string, predicate string, object string, "
    "object_is_iri boolean, object_datatype string"
)
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class TestNestedShapes:
    def _shapes(self):
        from genegraph_spark.operators.validate import NodeShape, PropertyShape

        return [
            NodeShape(
                "Leaf",
                ":LeafType",
                (PropertyShape(":val", min_count=1, datatype="xsd:integer"),),
            ),
            NodeShape(
                "Root",
                ":RootType",
                (PropertyShape(":child", min_count=1, node="Leaf"),),
            ),
        ]

    def test_violation_propagates_through_node_reference(self, spark):
        from genegraph_spark.operators.validate import validate_graph_shapes

        rows = [
            # good: root1 -> leaf1 (valid)
            ("g", "urn:root1", RDF_TYPE, ":RootType", True, None),
            ("g", "urn:root1", ":child", "urn:leaf1", True, None),
            ("g", "urn:leaf1", RDF_TYPE, ":LeafType", True, None),
            ("g", "urn:leaf1", ":val", "5", False, "xsd:integer"),
            # bad: root2 -> leaf2 (leaf2 missing :val → root2 fails sh:node)
            ("g", "urn:root2", RDF_TYPE, ":RootType", True, None),
            ("g", "urn:root2", ":child", "urn:leaf2", True, None),
            ("g", "urn:leaf2", RDF_TYPE, ":LeafType", True, None),
            # bad: root3 has no :child at all (minCount)
            ("g", "urn:root3", RDF_TYPE, ":RootType", True, None),
        ]
        t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        out = {
            (r.focus, r.shape): (r.conforms, list(r.violations))
            for r in validate_graph_shapes(t, self._shapes()).collect()
        }
        assert out[("urn:leaf1", "Leaf")] == (True, [])
        assert out[("urn:leaf2", "Leaf")] == (False, [":val:minCount"])
        assert out[("urn:root1", "Root")] == (True, [])
        assert out[("urn:root2", "Root")] == (False, [":child:node"])
        assert out[("urn:root3", "Root")] == (False, [":child:minCount"])

    def test_cycle_detection(self, spark):
        from genegraph_spark.operators.validate import (
            NodeShape,
            PropertyShape,
            validate_graph_shapes,
        )

        t = spark.createDataFrame([], TRIPLE_SCHEMA)
        cyc = [
            NodeShape("A", ":A", (PropertyShape(":p", node="B"),)),
            NodeShape("B", ":B", (PropertyShape(":q", node="A"),)),
        ]
        with pytest.raises(ValueError, match="cycle"):
            validate_graph_shapes(t, cyc)

    def test_unknown_reference(self, spark):
        from genegraph_spark.operators.validate import (
            NodeShape,
            PropertyShape,
            validate_graph_shapes,
        )

        t = spark.createDataFrame([], TRIPLE_SCHEMA)
        with pytest.raises(ValueError, match="unknown shape"):
            validate_graph_shapes(
                t, [NodeShape("A", ":A", (PropertyShape(":p", node="Nope"),))]
            )


# ---------------------------------------------------------------------------
# RDF/XML
# ---------------------------------------------------------------------------


class TestRdfXml:
    def test_round_trip_with_special_characters(self, spark):
        from genegraph_spark.functions import serialize as SER

        rows = [
            ("g1", "urn:s", "https://ex/p/title", 'a "<b>&c\nd\re', False, None),
            ("g1", "urn:s", "https://ex/p/n", "7", False, "xsd:integer"),
            ("g1", "urn:s", "https://ex/p/link", "urn:o&<>", True, None),
            ("g1", "urn:s", "https://ex/p/anon", "_:b1", True, None),
            ("g1", "_:b1", "https://ex/p#frag", "leaf", False, None),
            ("g2", "urn:z", "https://ex/p/only", "urn:s", True, None),
        ]
        t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        docs = SER.rdfxml_docs(t)
        assert docs.count() == 2
        back = SER.parse_rdfxml(docs)
        orig = {tuple(r) for r in t.collect()}
        got = {tuple(r) for r in back.select(*t.columns).collect()}
        assert got == orig

    def test_byte_determinism_across_partitionings(self, spark):
        from genegraph_spark.functions import serialize as SER

        rows = [
            ("g", f"urn:s{i % 3}", "https://ex/p/v", str(i), False, None)
            for i in range(30)
        ]
        a = spark.createDataFrame(rows, TRIPLE_SCHEMA).repartition(8)
        b = spark.createDataFrame(list(reversed(rows)), TRIPLE_SCHEMA).repartition(2)
        da = SER.rdfxml_docs(a).collect()[0].rdfxml
        db = SER.rdfxml_docs(b).collect()[0].rdfxml
        assert da == db


# ---------------------------------------------------------------------------
# Assertion-backed resolvers
# ---------------------------------------------------------------------------


class TestAssertionResolvers:
    def test_affiliation_rollups_consistent(self, spark, sf_dir):
        from genegraph_spark.plans import curation as CUR

        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        a = CUR.curation_assertions(ev)
        aff = CUR.affiliations(a)
        # every assertion counted exactly once across affiliations
        total = aff.agg(F.sum("n_assertions")).collect()[0][0]
        assert total == ev.count()
        gc = CUR.genetic_conditions(a)
        row = gc.agg(
            F.sum("n_assertions").alias("n"),
            F.max("n_affiliations").alias("maxaff"),
        ).collect()[0]
        assert row.n == ev.count()
        assert row.maxaff <= 10
        # latest_assertion is a member of the condition's assertion set
        j = gc.join(
            a.select("gene", "disease", "moi", F.col("assertion").alias("latest_assertion")),
            ["gene", "disease", "moi", "latest_assertion"],
            "left_semi",
        )
        assert j.count() == gc.count()

    def test_resolver_registry_dispatch(self, spark, sf_dir):
        from genegraph_spark.plans import curation as CUR
        from genegraph_spark.plans.resolvers import resolve

        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        a = CUR.curation_assertions(ev)
        assert resolve("affiliations", a).count() == 10


# ---------------------------------------------------------------------------
# IVF index drift telemetry
# ---------------------------------------------------------------------------


class TestIvfDriftTelemetry:
    def test_counts_and_imbalance_track_build_and_upsert(self, spark, sf_dir, tmp_path):
        import json

        from genegraph_spark.operators import similarity as SIM

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        base = emb.where("vec_id >= 10")
        path = str(tmp_path / "ivf_tel")
        idx = SIM.IvfIndex.build(base, path)
        counts = idx.meta["centroid_counts"]
        assert sum(counts.values()) == base.count()
        imb0 = idx.imbalance()
        assert imb0 >= 1.0

        # skewed upsert: every new vector pushed through assignment; the
        # stat must change and persist to meta.json
        extra = emb.where("vec_id < 10").select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
        )
        idx.upsert(extra)
        assert sum(idx.meta["centroid_counts"].values()) == base.count() + extra.count()
        on_disk = json.load(open(os.path.join(path, "meta.json")))
        assert on_disk["centroid_counts"] == idx.meta["centroid_counts"]
        # a reloaded index sees the same telemetry without scanning corpus
        reloaded = SIM.IvfIndex(spark, path)
        assert reloaded.imbalance() == reloaded.imbalance()
        assert sum(reloaded.meta["centroid_counts"].values()) == base.count() + extra.count()


# ---------------------------------------------------------------------------
# Store-diff-driven cache invalidation
# ---------------------------------------------------------------------------


class TestCacheInvalidation:
    @pytest.fixture()
    def store2(self, spark, tmp_path):
        """A store with two commits: commit 1 rewrites graph g1 (entity
        urn:e1 dropped, urn:e3 added) and leaves g2 untouched."""
        from genegraph_spark.sinks.named_graph import TRIPLE_SCHEMA, NamedGraphStore

        store = NamedGraphStore(spark, str(tmp_path / "store"), n_buckets=4)
        v1 = spark.createDataFrame(
            [
                ("g1", "urn:s1", ":mentions", "urn:e1", True, None),
                ("g1", "urn:s1", ":lang", "en", False, None),
                ("g2", "urn:s2", ":mentions", "urn:e2", True, None),
            ],
            TRIPLE_SCHEMA,
        )
        store.merge(v1)
        v2_g1 = spark.createDataFrame(
            [("g1", "urn:s1", ":mentions", "urn:e3", True, None)], TRIPLE_SCHEMA
        )
        store.merge(v2_g1)
        return store

    def test_changed_resources_is_diff_scoped(self, spark, store2):
        from genegraph_spark.plans.invalidation import changed_resources

        got = {r.resource for r in changed_resources(store2, 0, 1).collect()}
        # g1's resources across both versions; nothing from untouched g2
        assert got == {"g1", "urn:s1", "urn:e1", "urn:e3"}

    def test_resolver_cache_modes(self, spark, store2):
        from genegraph_spark.plans.invalidation import ResolverCache

        c = ResolverCache()
        c.register("statistics", mode="always")
        c.register("entity_card", mode="by_entity")
        c.register("prefix_table", mode="never")
        c.put("statistics", "_", {"n": 3})
        c.put("entity_card", "urn:e1", {"label": "E1"})
        c.put("entity_card", "urn:e2", {"label": "E2"})
        c.put("prefix_table", "_", {"kgp": "..."})
        out = c.expire_for_commit(store2, 0, 1)
        assert out["dropped"] == 2  # statistics + urn:e1 card
        assert c.get("statistics", "_") is None
        assert c.get("entity_card", "urn:e1") is None
        assert c.get("entity_card", "urn:e2") == {"label": "E2"}  # untouched
        assert c.get("prefix_table", "_") == {"kgp": "..."}
        with pytest.raises(KeyError):
            c.get("unregistered", "x")

    def test_response_cache_clears_on_new_commit(self):
        from genegraph_spark.plans.invalidation import ResponseCache

        rc = ResponseCache()
        rc.put("query A", "resp@0", current_commit=0)
        assert rc.get("query A", current_commit=0) == "resp@0"
        assert rc.get("query A", current_commit=1) is None  # cleared
        rc.put("query A", "resp@1", current_commit=1)
        assert rc.get("query A", current_commit=1) == "resp@1"


# ---------------------------------------------------------------------------
# Substring-level duplicate spans
# ---------------------------------------------------------------------------


class TestDuplicateSpans:
    def test_shared_run_produces_merged_span(self, spark):
        from genegraph_spark.operators.dedup import duplicate_spans

        shared = "a b c d e f g h i j k l"  # 12 tokens shared verbatim
        docs = spark.createDataFrame(
            [
                (1, "x1 y1 " + shared + " z1 w1"),
                (2, "x2 " + shared + " z2"),
                (3, "totally different words here with no repeats at all"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in duplicate_spans(docs, k=10).collect()}
        # doc1: shared run starts at token 2, 12 tokens -> 3 grams at
        # pos 2,3,4 merge into one span [2, 13]
        assert (out[1].span_start, out[1].span_end, out[1].n_tokens) == (2, 13, 12)
        assert (out[2].span_start, out[2].span_end, out[2].n_tokens) == (1, 12, 12)
        assert 3 not in out

    def test_disjoint_runs_stay_separate(self, spark):
        from genegraph_spark.operators.dedup import duplicate_spans

        run1 = "p q r s t u v w x y"   # 10 tokens
        run2 = "m n o aa bb cc dd ee ff gg"  # 10 tokens
        docs = spark.createDataFrame(
            [
                (1, run1 + " GAP1 GAP2 GAP3 " + run2),
                (2, run1 + " other other2 other3 other4 " + run2),
            ],
            "doc_id long, text string",
        )
        spans = [
            (r.span_start, r.span_end)
            for r in duplicate_spans(docs, k=10).where("doc_id = 1").collect()
        ]
        # doc1 = run1 (tokens 0-9) + 3 GAP tokens + run2 (tokens 13-22)
        assert sorted(spans) == [(0, 9), (13, 22)]


# ---------------------------------------------------------------------------
# Streamed event loop → named-graph store
# ---------------------------------------------------------------------------


class TestStreamToStore:
    def test_streamed_merges_converge_to_batch_content(self, spark, sf_dir, tmp_path):
        """The primary loop streamed end to end: two source deliveries →
        per-micro-batch construct_kg + store MERGE; final store content
        must equal the one-shot batch pipeline over the same pages, and
        the second run must only process the NEW files (checkpoint
        catch-up)."""
        from genegraph_spark import fixtures
        from genegraph_spark.plans.pipeline import construct_kg
        from genegraph_spark.sinks.named_graph import NamedGraphStore
        from genegraph_spark.streaming.stream import stream_pages_to_store

        src = str(tmp_path / "src")
        store_path = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        pages = fixtures.pages_df(spark, sf_dir)
        # delivery 1: even doc_ids (all versions of a url share a doc_id,
        # so url families stay within one delivery)
        pages.where("doc_id % 2 = 0").repartition(2).write.mode("overwrite").parquet(src)
        r1 = stream_pages_to_store(spark, sf_dir, src, store_path, ckpt)
        assert r1["batches"] >= 1 and r1["last_commit"] is not None
        c1 = r1["last_commit"]

        # delivery 2: the odd half arrives later
        pages.where("doc_id % 2 = 1").repartition(2).write.mode("append").parquet(src)
        r2 = stream_pages_to_store(spark, sf_dir, src, store_path, ckpt)
        assert r2["last_commit"] > c1  # new commits for the new files only

        store = NamedGraphStore(spark, store_path)
        got = store.triples().select(
            "graph", "subject", "predicate", "object", "object_is_iri"
        )
        want = construct_kg(spark, sf_dir).triples.select(
            "graph", "subject", "predicate", "object", "object_is_iri"
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

        # idle rerun: nothing new → no additional commits
        r3 = stream_pages_to_store(spark, sf_dir, src, store_path, ckpt)
        assert r3["batches"] == 0
        assert r3["last_commit"] == r2["last_commit"]


# ---------------------------------------------------------------------------
# Plan shapes for the round-4 training-data operators
# ---------------------------------------------------------------------------


class TestRound4PlanShapes:
    def test_decontaminate_broadcasts_benchmark_side(self, spark):
        """The benchmark n-gram set is fixed-size: it must broadcast; the
        corpus side must not shuffle into a sort-merge join."""
        from genegraph_spark.functions.textstats import decontaminate

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{i}x{j}" for j in range(20))) for i in range(50)],
            "doc_id long, text string",
        )
        bench = docs.where("doc_id < 3")
        plan = (
            decontaminate(docs, bench, n=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_duplicate_spans_no_cartesian_and_single_window(self, spark):
        from genegraph_spark.operators.dedup import duplicate_spans

        docs = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(15))) for i in range(10)],
            "doc_id long, text string",
        )
        plan = (
            duplicate_spans(docs, k=10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        # gap-and-island = lag + running sum over the same per-doc sort
        assert plan.count("Window [") <= 2

    def test_pagerank_iteration_count_is_bounded(self, spark):
        """Power iteration is a fixed chain — the checkpointed plan for
        5 iterations must not contain the full unchained lineage."""
        from genegraph_spark.operators.graphstats import pagerank

        e = spark.createDataFrame(
            [(f"n{i}", f"n{(i * 7 + 1) % 40}") for i in range(40)],
            "src string, dst string",
        )
        out = pagerank(e, n_iter=5)
        total = out.agg(F.round(F.sum("rank"), 2)).collect()[0][0]
        # dangling-mass-leaking variant: total <= 1, > teleport floor
        assert 0.1 < total <= 1.001


# ---------------------------------------------------------------------------
# Binary transport docs (RDF-Thrift role)
# ---------------------------------------------------------------------------


class TestBinaryDocs:
    def test_round_trip_and_determinism(self, spark):
        from genegraph_spark.functions import serialize as SER

        rows = [
            ("g1", "urn:s", ":p", "v " * 200, False, None),
            ("g1", "urn:s", ":q", "urn:o", True, None),
            ("g2", "urn:z", ":p", "x", False, "xsd:string"),
        ]
        t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        docs = SER.binary_docs(t)
        got = docs.collect()
        assert len(got) == 2
        # compression actually compresses the repetitive doc
        doc_len = len(
            SER.graph_documents(t).where("graph = 'g1'").collect()[0].doc
        )
        blob_len = len([r for r in got if r.graph == "g1"][0].blob)
        assert blob_len < doc_len / 2
        # byte determinism across partitionings
        other = SER.binary_docs(
            spark.createDataFrame(list(reversed(rows)), TRIPLE_SCHEMA).repartition(7)
        ).collect()
        assert {r.graph: bytes(r.blob) for r in got} == {
            r.graph: bytes(r.blob) for r in other
        }
        # round trip
        back = SER.parse_binary_docs(docs)
        orig = {tuple(r) for r in t.collect()}
        # parse_documents round-trips datatype '' -> null like the JSON path
        got_back = {tuple(r) for r in back.select(*t.columns).collect()}
        assert got_back == orig
