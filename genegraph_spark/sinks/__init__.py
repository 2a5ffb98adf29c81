"""Sinks: named-graph-partitioned triple store, lineage, quarantine."""
