"""Store-diff-driven view/resolver cache invalidation — the batch analog
of the reference's event-driven cache expiry.

Reference analogs: the resolver cache expires entries when an incoming
event's model references their resources
(``source/graphql/common/cache.clj:47-57``
``expire-resolver-cache-on-event!`` walks ``q/referenced-resources`` of
the event and deletes by prefix; ``:expire-always`` entries drop on any
db-updating event), and the whole-response cache clears on any update
(``response_cache.clj:25-68``). A batch engine has no per-event
interceptor chain — the equivalent signal is the COMMIT DIFF: after a
merge, :meth:`NamedGraphStore.diff` names every changed graph, and the
resources referenced by those graphs' triples are exactly the
``referenced-resources`` set of all the events folded into the commit.

Spark-first: the changed-resource set is computed set-at-a-time with one
semi-join of the two snapshots against the changed-graph list — never a
per-event loop. The cache itself is driver-side (serving-tier state,
like the reference's RocksDB instance); only its INVALIDATION math runs
on the cluster, and the collect is bounded by the diff's resource count
(incremental commits touch few graphs relative to the corpus — the same
bound the reference relies on when it deletes by event).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changed_resources(store, commit_a: int, commit_b: int) -> DataFrame:
    """(resource) — every IRI referenced by a graph whose content changed
    between the two commits: the union over both snapshots of changed
    graphs' subjects and IRI objects, plus the graph names themselves
    (``q/referenced-resources`` of the folded events,
    ``database/query.clj`` — a graph IS a resource in the named-graph
    model)."""
    changed = store.diff(commit_a, commit_b).select("graph")
    refs = []
    for commit in (commit_a, commit_b):
        t = store.triples(commit=commit).join(changed, "graph", "left_semi")
        refs.append(t.select(F.col("graph").alias("resource")))
        refs.append(t.select(F.col("subject").alias("resource")))
        refs.append(
            t.where(F.col("object_is_iri")).select(F.col("object").alias("resource"))
        )
    out = refs[0]
    for r in refs[1:]:
        out = out.unionByName(r)
    return out.distinct()


@dataclass
class ResolverCache:
    """Keyed result cache with the reference's three expiry modes
    (``cache.clj:16-45``): ``always`` (drop on any commit),
    ``by_entity`` (drop when the entry's key resource is referenced by
    the commit diff), ``never`` (immutable lookups). Entries are
    driver-side values (collected resolver results, rendered responses —
    serving-tier payloads, not DataFrames)."""

    _modes: dict = field(default_factory=dict)
    _entries: dict = field(default_factory=dict)  # (view, key) -> value
    stats: dict = field(default_factory=lambda: {"hits": 0, "misses": 0, "expired": 0})

    def register(self, view: str, mode: str = "always") -> None:
        if mode not in ("always", "by_entity", "never"):
            raise ValueError(f"unknown cache mode {mode!r}")
        self._modes[view] = mode

    def _check(self, view: str) -> None:
        if view not in self._modes:
            raise KeyError(f"view {view!r} not registered; known: {sorted(self._modes)}")

    def put(self, view: str, key: str, value) -> None:
        self._check(view)
        self._entries[(view, key)] = value

    def get(self, view: str, key: str, default=None):
        self._check(view)
        if (view, key) in self._entries:
            self.stats["hits"] += 1
            return self._entries[(view, key)]
        self.stats["misses"] += 1
        return default

    def expire_for_commit(self, store, commit_a: int, commit_b: int) -> dict:
        """Apply one commit's diff: drop every ``always`` entry and every
        ``by_entity`` entry whose key is in :func:`changed_resources`
        (the ``expire-resolver-cache-on-event!`` walk, batched). Returns
        ``{"dropped": n, "changed_resources": m}``."""
        touched = {
            r["resource"]
            for r in changed_resources(store, commit_a, commit_b).collect()
        }
        dropped = 0
        for (view, key) in list(self._entries):
            mode = self._modes[view]
            if mode == "always" or (mode == "by_entity" and key in touched):
                del self._entries[(view, key)]
                dropped += 1
        self.stats["expired"] += dropped
        return {"dropped": dropped, "changed_resources": len(touched)}

    def __len__(self) -> int:
        return len(self._entries)


@dataclass
class ResponseCache:
    """Whole-response cache cleared on ANY store update
    (``response_cache.clj:25-68``): the coarse outer layer in front of
    the resolver cache. Keyed by the request body, like the reference."""

    _entries: dict = field(default_factory=dict)
    _commit: int | None = None

    def get(self, request_body: str, current_commit: int):
        """A response is valid only for the commit it was rendered at —
        reading at a newer commit clears everything first (the
        expiration-notification channel, response_cache.clj:31-38)."""
        if current_commit != self._commit:
            self._entries.clear()
            self._commit = current_commit
        return self._entries.get(request_body)

    def put(self, request_body: str, response, current_commit: int) -> None:
        if current_commit != self._commit:
            self._entries.clear()
            self._commit = current_commit
        self._entries[request_body] = response
