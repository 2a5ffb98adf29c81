"""Distributed operators: query algebra over triples, versioned as-of
windows, mention detection / entity linking, canonicalization, dedup,
similarity search."""
