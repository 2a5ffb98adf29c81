"""Local-name resolution: ``:ns/name`` CURIE-keywords → full IRIs.

The reference resolves default-prefix tokens like
``:sepio/evidence-line-strength-score`` through keyword→IRI tables
loaded from EDN resources (``database/names.clj:61-90`` reads
``property-names.edn`` / ``class-names.edn``). This module loads those
same EDN files AT RUNTIME when available — parity without copying the
mapping into this repo.

Engine default stays the raw-CURIE convention (every existing query and
oracle treats ``:sepio/x`` as an opaque term, consistently on the emit
and match sides). Name expansion is OPT-IN per query
(``PreparedQuery(text, names=...)``) and is required only where a
default-prefix name must equal a full IRI coming from somewhere else —
e.g. the gene-validity chain, where ``gdm_sepio_relationships.ttl``
types evidence lines with ``http://purl.obolibrary.org/obo/SEPIO_*``
IRIs that ``unlink_variant_scores_when_proband_scores_exist.sparql``
then matches as ``:sepio/NullVariantEvidenceLine``.
"""

from __future__ import annotations

import re

# [:ns/name "iri"] — tolerates a newline between keyword and IRI and the
# wrapping vector; EDN comments (;) are stripped line-wise first.
_ENTRY = re.compile(r'\[\s*:([^\s\[\]"]+)\s+"([^"]+)"\s*\]')


def load_names_edn(*paths: str) -> dict[str, str]:
    """Parse keyword→IRI EDN vectors into ``{":ns/name": iri}``.

    Later files (and later duplicate entries) win, matching Clojure's
    ``into {}`` merge order. Driver-side, dictionary-scale."""
    out: dict[str, str] = {}
    for path in paths:
        with open(path) as f:
            text = "\n".join(
                line.split(";", 1)[0] for line in f.read().splitlines()
            )
        for m in _ENTRY.finditer(text):
            out[":" + m.group(1)] = m.group(2)
    return out
