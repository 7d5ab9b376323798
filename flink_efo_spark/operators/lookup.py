"""Lookup join (SURVEY §2.3: StreamExecLookupJoin / BatchExecLookupJoin,
LookupJoinRunner.java:36, AsyncLookupJoinRunner.java in /root/reference).

Two realizations:

* :func:`lookup_join` — the dimension is (re)loadable as a DataFrame:
  broadcast hash join against the current snapshot. This is the right
  plan whenever the dim table fits the broadcast threshold — per-row
  point lookups are strictly worse on a cluster.
* :func:`lookup_join_batched` — the dimension is only reachable
  through a point-lookup callable (external KV store/service):
  ``mapInPandas`` batches distinct keys per Arrow batch and invokes
  the callable once per batch (AsyncLookupJoinRunner's batching,
  without the async client). Python-side by necessity — the external
  client is Python.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def lookup_join(
    probe: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Snapshot lookup join: broadcast the dimension's current state.
    In streaming, call inside foreachBatch with a re-read dim for
    per-batch snapshot semantics (TemporalProcessTimeJoinOperator)."""
    return probe.join(F.broadcast(dim), on=on, how=how)


class _LookupCache:
    """Per-task LRU + TTL lookup cache — the reference's
    JdbcLookupOptions (``lookup.cache.max-rows`` /
    ``lookup.cache.ttl``, JdbcLookupFunction.java's guava cache):
    repeated keys skip the external store until their entry expires
    or is evicted. Negative results (key absent) are cached too,
    matching the reference. Worker-local by design — at 1000
    executors that is 1000 independent caches, each bounded by
    ``max_rows``."""

    def __init__(self, max_rows: int, ttl_s: float | None):
        from collections import OrderedDict

        self._d: "OrderedDict" = OrderedDict()
        self._max = max_rows
        self._ttl = ttl_s
        self.hits = 0
        self.misses = 0

    def split(self, keys: list) -> tuple[dict, list]:
        """(cached {key: row}, keys needing a real lookup)."""
        import time

        now = time.monotonic()
        cached, need = {}, []
        for k in keys:
            ent = self._d.get(k)
            if ent is not None and (self._ttl is None or now - ent[1] <= self._ttl):
                self._d.move_to_end(k)
                cached[k] = ent[0]
                self.hits += 1
            else:
                need.append(k)
                self.misses += 1
        return cached, need

    def put(self, fetched: Mapping, asked: list) -> None:
        import time

        now = time.monotonic()
        for k in asked:
            self._d[k] = (fetched.get(k), now)
            self._d.move_to_end(k)
        while len(self._d) > self._max:
            self._d.popitem(last=False)


def lookup_join_batched(
    probe: DataFrame,
    lookup_fn: Callable[[list], Mapping],
    key_col: str,
    value_fields: list[tuple[str, str]],
    cache_max_rows: int | None = None,
    cache_ttl_s: float | None = None,
) -> DataFrame:
    """Batched point-lookup join: ``lookup_fn(keys) -> {key: row_dict}``
    is called once per Arrow batch with the batch's distinct keys.

    ``value_fields``: [(name, spark_type_ddl)] of the looked-up columns
    (left-join semantics — missing keys yield NULLs).

    ``cache_max_rows`` enables the reference's lookup cache
    (``lookup.cache.max-rows`` / ``lookup.cache.ttl``): keys seen
    within the TTL are served from a per-task LRU instead of the
    store — the knob that turns a hot-key lookup workload from
    O(rows) external calls into O(distinct keys per TTL window).
    """
    import pandas as pd

    out_schema = StructType(
        probe.schema.fields
        + [
            StructField(n, _parse_type(t))
            for n, t in value_fields
        ]
    )
    names = [n for n, _ in value_fields]

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache = (
            _LookupCache(cache_max_rows, cache_ttl_s)
            if cache_max_rows is not None
            else None
        )
        for pdf in batches:
            keys = list(pd.unique(pdf[key_col].dropna()))
            if cache is None:
                found = dict(lookup_fn(keys)) if keys else {}
            else:
                found, need = cache.split(keys)
                if need:
                    fetched = dict(lookup_fn(need))
                    cache.put(fetched, need)
                    found.update({k: fetched.get(k) for k in need})
            for n in names:
                pdf = pdf.assign(
                    **{n: pdf[key_col].map(lambda k: (found.get(k) or {}).get(n))}
                )
            yield pdf

    return probe.mapInPandas(fn, out_schema)


def lookup_join_async(
    probe: DataFrame,
    lookup_fn: Callable[[list], Mapping],
    key_col: str,
    value_fields: list[tuple[str, str]],
    capacity: int = 10,
    batch_size: int = 100,
) -> DataFrame:
    """ASYNC lookup join (AsyncLookupJoinRunner.java:52 +
    AsyncWaitOperator ORDERED mode in the reference): up to
    ``capacity`` lookup invocations in flight CONCURRENTLY per task,
    so a slow external store overlaps rather than serializes — the
    throughput gap the sync batched variant leaves on the table.

    Per Arrow batch: distinct keys split into ``batch_size`` chunks,
    chunks dispatched through a thread pool (``capacity`` workers),
    results merged back positionally — row order is preserved, which
    is exactly the reference's ORDERED output mode (the default).

    ``lookup_fn(keys) -> {key: row_dict}`` must be thread-safe (the
    reference imposes the same contract on its AsyncFunction).
    """
    import pandas as pd

    out_schema = StructType(
        probe.schema.fields
        + [StructField(n, _parse_type(t)) for n, t in value_fields]
    )
    names = [n for n, _ in value_fields]

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=capacity) as pool:
            for pdf in batches:
                keys = list(pd.unique(pdf[key_col].dropna()))
                chunks = [
                    keys[i : i + batch_size]
                    for i in range(0, len(keys), batch_size)
                ]
                found: dict = {}
                for res in pool.map(lookup_fn, chunks):
                    found.update(res)
                for n in names:
                    pdf = pdf.assign(
                        **{
                            n: pdf[key_col].map(
                                lambda k: (found.get(k) or {}).get(n)
                            )
                        }
                    )
                yield pdf

    return probe.mapInPandas(fn, out_schema)


def dim_snapshot_client(
    dim: DataFrame,
    key_col: str,
    value_cols: list[str],
    max_rows: int = 100_000,
) -> Callable[[list], Mapping]:
    """TEST-FIXTURE stand-in for an external point-lookup client: snap
    a SMALL dimension to a driver dict and return a thread-safe
    ``lookup_fn(keys) -> {key: row_dict}`` for
    :func:`lookup_join_batched` / :func:`lookup_join_async`.

    This is NOT the production plan — in production ``lookup_fn``
    wraps a real external store client (JDBC / KV / REST; the
    reference's AsyncFunction contract), and nothing is collected to
    the driver. The ``max_rows`` guard refuses dimensions that do not
    plausibly fit a snapshot (and past the broadcast threshold you
    want :func:`lookup_join`, not a dict, anyway): exceeding it raises
    instead of silently shipping a huge dict to every task."""
    rows = dim.select(key_col, *value_cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"dimension exceeds the snapshot fixture bound ({max_rows} "
            "rows) — wire a real external client, or use lookup_join"
        )
    snap = {r[key_col]: {c: r[c] for c in value_cols} for r in rows}

    def lookup_fn(keys: list) -> dict:
        return {k: snap[k] for k in keys if k in snap}

    return lookup_fn


def _parse_type(ddl: str):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)
