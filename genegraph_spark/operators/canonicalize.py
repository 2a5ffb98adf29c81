"""Entity canonicalization: connected components over same-as edges, with
MinHash-LSH blocking for surface-form matching at scale.

Reference analog: genegraph's fixpoint traversal (transitive
``rdfs:subClassOf*`` property paths,
``src/genegraph/source/graphql/common/curation.clj:303-314``) and its
external VRS normalizer + cache
(``src/genegraph/transform/clinvar/cancervariants.clj:59-151``), replaced
per the north rule by a deterministic local canonicalizer: same-as xref
edges (``owl:sameAs``) union surface-form near-match edges → iterative
join to fixpoint → canonical IRI = min entity IRI per component.

Scale notes: the driver-side loop is the alternating "large-star /
small-star" contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", SOCC'14) — O(log n) rounds, each round two
self-joins keyed by node. We localCheckpoint every round to cut lineage
(the same reason the reference caches its union model per tx,
``database/util.clj:13-22``). Hot components (BRCA1-class entities with
millions of same-as mentions) stay small here because components are over
the *dictionary + xref* vocabulary, not the corpus; corpus skew is
handled downstream at the mention join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    local_threshold: int = 200_000,
) -> DataFrame:
    """Min-label propagation to fixpoint. Returns (node, component).

    ``component`` is the lexicographic min node id reachable — fully
    deterministic, independent of partitioning and iteration order.

    Adaptive execution: a driver-side fixpoint loop costs ~1s of job
    scheduling per round regardless of data size, so graphs under
    ``local_threshold`` edges (the curated-dictionary case — always
    dictionary-scale, not corpus-scale) are collected and union-found on
    the driver in one pass; bigger graphs take the distributed iterative
    path. Same result either way (both take the min node id per
    component)."""
    probe = edges.select(src, dst).limit(local_threshold + 1).collect()
    if len(probe) <= local_threshold:
        rows = probe
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = find(r[0]), find(r[1])
            if a != b:
                parent[max(a, b)] = min(a, b)
        # second pass: min node id per root (roots are already the min
        # because union always parents the larger under the smaller)
        out = sorted((n, find(n)) for n in parent)
        return edges.sparkSession.createDataFrame(out, "node string, component string")
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .union(sym.select(F.col("b").alias("node")))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # candidate label for each node = min(own, min over neighbors)
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left_outer")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def surface_form_edges(
    labels: DataFrame,
    iri_col: str = "iri",
    label_col: str = "label",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-match edges between entities whose surface forms are
    near-duplicates — the MinHash-LSH blocking half of canonicalization
    (SURVEY §7 stage 4; replaces the reference's external VRS normalizer
    lookups, cancervariants.clj:59-151, with a deterministic local
    matcher).

    Character-shingled labels → MinHash signatures → banded LSH buckets →
    true-Jaccard verify ≥ threshold → (src, dst) entity edges. Feed the
    union of these and the explicit same-as edges to
    :func:`connected_components`. Scale: identical shape to
    operators/dedup.py's document path — candidates come from bucket
    joins, never all-pairs."""
    from . import dedup as D

    # one MinHash document per (iri, label) PAIR — pooling all of an
    # entity's labels into one shingle set dilutes Jaccard (a shared
    # surface form drowns under an unrelated synonym's shingles); the
    # pair id carries the iri so edges project back after matching
    sep = ""
    spaced = labels.select(
        F.concat_ws(
            sep, F.col(iri_col), F.md5(F.lower(F.col(label_col)))
        ).alias("doc_id"),
        F.concat_ws(" ", F.split(F.lower(F.col(label_col)), "")).alias("text"),
    ).where(F.length("text") > 0).distinct()
    pairs = D.minhash_near_duplicates(
        spaced, id_col="doc_id", text_col="text", k=k,
        n_hashes=n_hashes, n_bands=n_bands, threshold=threshold,
    )
    return (
        pairs.select(
            F.substring_index("id_a", sep, 1).alias("src"),
            F.substring_index("id_b", sep, 1).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def canonical_entity_map(
    dictionary: DataFrame,
    sameas: DataFrame,
    local_threshold: int = 200_000,
    surface_edges: DataFrame | None = None,
) -> DataFrame:
    """(iri, canonical_iri): canonical = min *entity* IRI per component.

    Singleton entities (no shared xref) map to themselves.
    ``surface_edges``: optional (src, dst) near-match edges from
    :func:`surface_form_edges`, unioned with the explicit same-as graph.
    """
    edges = sameas.select(F.col("iri").alias("src"), F.col("xref").alias("dst"))
    if surface_edges is not None:
        edges = edges.unionByName(surface_edges.select("src", "dst"))
    comps = connected_components(edges, local_threshold=local_threshold)
    entities = dictionary.select("iri").distinct()
    ent_comp = entities.join(comps, entities["iri"] == comps["node"], "left_outer").select(
        "iri", F.coalesce("component", "iri").alias("component")
    )
    canon = ent_comp.groupBy("component").agg(F.min("iri").alias("canonical_iri"))
    return ent_comp.join(canon, "component").select("iri", "canonical_iri")
