"""GraphQL service: execute GraphQL documents against Spark DataFrames.

The reference is a GraphQL service over columnar tables (reference
middleware.py:41-65); this is the same architecture over PySpark:

* ``GraphQLService(roots)`` derives a GraphQL schema from each root's
  ``StructType`` (one typed Table per root; single-root mode exposes the
  table's fields at the query root, like ``GraphQL(root)``).
* Each resolver builds a new *lazy* Dataset; only scalar leaves
  (``count``, ``values``, ``row``...) launch Spark jobs.
* When a table field has multiple table/leaf sub-selections, the frame is
  persisted (MEMORY_AND_DISK) for the duration of the request so sibling
  fields share one materialization — the reference's ``resolve()``/
  ``.cache()`` trick (reference interface.py:83-91) — and unpersisted when
  the request finishes.

No ASGI dependency: ``execute`` is synchronous/in-process. Any HTTP layer
can wrap it; the engine itself stays transport-neutral.
"""

from __future__ import annotations

from typing import Any, Mapping

from graphql import GraphQLSchema, graphql_sync
from pyspark.sql import DataFrame

from graphique_spark.dataset import Dataset
from graphique_spark.service.schema import SchemaBuilder


class GraphQLError(Exception):
    pass


class _PersistRegistry:
    """Refcounted, lock-serialized persist/unpersist per canonicalized plan.

    Naive per-request ``df.persist()`` / ``df.unpersist()`` is unsafe under
    concurrent requests: two threads caching the SAME logical plan race in
    Spark's CacheManager (cacheQuery's lookup->build isn't atomic across
    sessions' calls), and the losing thread's materialized InMemoryRelation
    RDD is never deregistered — measured here as persistent-RDD blocks
    accumulating across request bursts while cacheManager.isEmpty() stays
    true (an executor-memory leak on a long-lived service). One request
    unpersisting a plan another request is still using additionally forces
    recomputation. This registry keys entries by the JVM-canonicalized
    plan (semanticHash + sameResult confirmation): the FIRST acquirer
    persists, later acquirers just bump the refcount, and the LAST release
    unpersists — all under one Python lock so the JVM cache mutations for
    a plan never interleave.
    """

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._entries: dict[int, list[dict]] = {}

    @staticmethod
    def _jplan(ds: Dataset):
        return ds.df._jdf.queryExecution().analyzed().canonicalized()

    def acquire(self, ds: Dataset) -> dict:
        """Ensure ``ds``'s plan is persisted; returns a release token."""
        jplan = self._jplan(ds)
        h = jplan.semanticHash()
        with self._lock:
            bucket = self._entries.setdefault(h, [])
            for ent in bucket:
                if ent["plan"].sameResult(jplan):
                    ent["n"] += 1
                    return ent
            ent = {"hash": h, "plan": jplan, "ds": ds.persist(), "n": 1}
            bucket.append(ent)
            return ent

    def release(self, ent: dict) -> None:
        with self._lock:
            ent["n"] -= 1
            if ent["n"] == 0:
                bucket = self._entries.get(ent["hash"], [])
                if ent in bucket:
                    bucket.remove(ent)
                    if not bucket:
                        del self._entries[ent["hash"]]
                ent["ds"].unpersist()


class GraphQLService:
    def __init__(
        self,
        roots: Mapping[str, Dataset | DataFrame] | Dataset | DataFrame,
        allow_sql: bool = False,
        keys: Mapping[str, list[str]] | None = None,
    ):
        """``keys`` marks roots as federation entities (reference
        interface.py:93-98): ``{root_name: [key column, ...]}`` enables the
        ``_entities(representations:)`` and ``_service { sdl }`` fields."""
        if isinstance(roots, (Dataset, DataFrame)):
            roots = {"table": roots}
        self.roots = {
            name: ds if isinstance(ds, Dataset) else Dataset(ds) for name, ds in roots.items()
        }
        for name, ds in self.roots.items():  # join/union targets resolve by name
            ds.roots.update(self.roots)
            if ds._source is None:
                # toSql rendering: a root with no recorded origin (a bare
                # DataFrame) renders as its root name — runnable once the
                # caller registers a matching temp view / catalog table
                from graphique_spark import sqlrender

                ds._source = sqlrender.table_ref(name)
                ds._ops = ()
        self.allow_sql = allow_sql
        self._persist_registry = _PersistRegistry()
        self.schema: GraphQLSchema = SchemaBuilder(self.roots, keys=keys).build()

    def execute(
        self,
        query: str,
        variables: Mapping[str, Any] | None = None,
        partial: bool = False,
    ) -> dict:
        """Run a GraphQL document; raise on any error (test-client style,
        reference conftest.py:26-31). ``partial=True`` returns whatever
        resolved, with failed fields nulled — the reference's ``optional``
        partial-results behavior (reference interface.py:138-141)."""
        result = self._run(query, variables)
        if result.errors and not partial:
            raise GraphQLError(result.errors) from result.errors[0].original_error
        return result.data

    def run(
        self,
        query: str,
        variables: Mapping[str, Any] | None = None,
        metrics: bool = False,
    ) -> dict:
        """HTTP-response-shaped execution: ``{data, errors?, extensions?}``
        with formatted (JSON-safe) errors. ``metrics=True`` adds per-resolver
        wall-clock timings, the reference's Apollo-tracing-derived metrics
        extension (reference middleware.py:22-38)."""
        middleware = [_MetricsMiddleware()] if metrics else None
        import time

        start = time.perf_counter()
        result = self._run(query, variables, middleware=middleware)
        payload: dict = {"data": result.data}
        if result.errors:
            payload["errors"] = [e.formatted for e in result.errors]
        if metrics:
            from datetime import timedelta

            payload["extensions"] = {
                "metrics": {
                    "duration": str(timedelta(seconds=time.perf_counter() - start)),
                    "execution": {"resolvers": middleware[0].resolvers},
                }
            }
        return payload

    def _run(self, query, variables=None, middleware=None):
        single = len(self.roots) == 1
        root_value = next(iter(self.roots.values())) if single else None
        context = {
            "roots": self.roots,
            "allow_sql": self.allow_sql,
            "persisted": [],
            "persist_registry": self._persist_registry,
        }
        try:
            result = graphql_sync(
                self.schema,
                query,
                root_value=root_value,
                context_value=context,
                variable_values=dict(variables or {}),
                middleware=middleware,
            )
        finally:
            # graphql_sync normally captures resolver errors in the result,
            # but if it raises (bad document, middleware error) the acquired
            # cache entries must still be released. Release is best-effort
            # PER TOKEN: one failing unpersist (a JVM hiccup) must neither
            # strand the remaining entries nor mask the request's result.
            for token in context["persisted"]:
                try:
                    if isinstance(token, Dataset):  # direct-persist fallback
                        token.unpersist()
                    else:
                        self._persist_registry.release(token)
                except Exception as exc:  # noqa: BLE001
                    import warnings

                    warnings.warn(f"persist release failed: {exc}", stacklevel=2)
        return result


class _MetricsMiddleware:
    """Per-resolver wall-clock timing (reference MetricsExtension,
    middleware.py:22-38) as graphql-core middleware — no tracing dependency."""

    def __init__(self):
        self.resolvers: list[dict] = []

    def resolve(self, next_, root, info, **args):
        import time
        from datetime import timedelta

        start = time.perf_counter()
        out = next_(root, info, **args)
        self.resolvers.append(
            {
                "path": list(info.path.as_list()),
                "duration": str(timedelta(seconds=time.perf_counter() - start)),
            }
        )
        return out


__all__ = ["GraphQLService", "GraphQLError"]
