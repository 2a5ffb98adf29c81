"""genegraph_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query and data-processing capabilities of
clingen-data-model/genegraph (reference studied at /root/reference, cited
as ``path:line`` in docstrings; no code copied — the reference is a
single-node Clojure/Jena event-to-RDF system, this is a distributed
Spark DataFrame pipeline designed for 10^12-document scale).

Layers
------
- ``fixtures``    deterministic Common-Crawl-style ``pages`` input table
                  + curated entity dictionary (the reference's
                  names.edn/HGNC dictionary re-expressed).
- ``functions``   vectorized scalar functions: HTML→text extraction,
                  IRI/CURIE handling, deterministic blank nodes, text
                  statistics (lang-id, quality, tokens, fingerprints).
- ``operators``   distributed operators: BGP/relational algebra over the
                  triples table, versioned as-of windows, gazetteer
                  mention detection + entity linking, MinHash-LSH +
                  connected-components canonicalization, dedup family,
                  similarity search.
- ``plans``       end-to-end pipeline assembly (the reference's
                  interceptor chain as a linear DataFrame plan).
- ``sinks``       named-graph-partitioned triple store with
                  replace-by-graph merge semantics, lineage + resume.
- ``streaming``   Structured Streaming variant of the ingest path.
"""

__version__ = "0.1.0"
