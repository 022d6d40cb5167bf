"""Incremental materialized-view maintenance over commit-log tables.

The batch complement to the streaming materialized view
(``streaming/jobs.py::run_streaming_silver_agg``): a JOIN view over two
transactional tables is refreshed by DELTA PROPAGATION instead of full
recomputation. For insert-only base-table windows,

    new_view = old_view ∪ (ΔL ⋈ R_old) ∪ (L_old ⋈ ΔR) ∪ (ΔL ⋈ ΔR)

where ΔL/ΔR come from ``TransactionalTable.read_appended`` — resolved
from the manifest file-set difference, so a refresh opens ONLY the
appended files plus the (version-pinned, immutable) old snapshots on
the opposite side of each delta join. At 100 TB this is the difference
between an hourly view refresh that joins an hour of arrivals and one
that re-joins a decade: each delta term has at least one delta-sized
side, the view itself is only APPENDED to (one manifest commit), and
optimistic concurrency (``expect_version``) keeps racing refreshers
from double-applying a window.

Non-append windows (compaction, delete, replace on a base table) make
the file diff diverge from the row delta; ``refresh_join_view`` then
raises and the caller runs ``full_refresh_join_view`` (or consumes
``changes()`` with retraction logic it controls). The algebra itself is
oracle-checked as ``q_incremental_join_view``; this operator wires it
to real table state and is pinned by tests/test_txtable.py (incremental
== full recompute across multi-batch append schedules; conflict and
non-append refusals).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

JoinFn = Callable[[DataFrame, DataFrame], DataFrame]


def _mv_state(view: TransactionalTable) -> tuple[dict | None, dict]:
    """(manifest, app-meta copy) of the view — app is copied so the
    refresh can update its ``mv`` slot without clobbering other state
    parked in the sticky ``app`` namespace (e.g. an IVF codebook)."""
    m = view.manifest()
    app = dict((m or {}).get("meta", {}).get("app") or {})
    return m, app


def full_refresh_join_view(
    spark: SparkSession,
    left: TransactionalTable,
    right: TransactionalTable,
    view: TransactionalTable,
    join_fn: JoinFn,
) -> dict:
    """Materialize ``join_fn(left, right)`` from the CURRENT snapshots
    as one replace commit, recording the consumed base versions. Used
    for bootstrap and as the fallback after a non-append-only window."""
    lv, rv = left.latest_version(), right.latest_version()
    result = join_fn(left.read(spark), right.read(spark))
    _, app = _mv_state(view)
    app["mv"] = {"left_version": lv, "right_version": rv}
    version = view.commit(result, mode="replace", meta={"app": app})
    return {
        "mode": "full",
        "view_version": version,
        "left_version": lv,
        "right_version": rv,
    }


def refresh_agg_view(
    spark: SparkSession,
    base: TransactionalTable,
    view: TransactionalTable,
    partial_fn: Callable[[DataFrame], DataFrame],
    merge_fn: Callable[[DataFrame], DataFrame],
) -> dict:
    """Incrementally refresh an AGGREGATE view (q_incremental_agg's
    partial re-aggregation, wired to real table state): the view stores
    per-key PARTIAL STATE — ``partial_fn(rows) -> state`` must produce
    mergeable monoid partials (count/sum/min/max; carry avg as
    sum+count and divide at read time) and ``merge_fn(state ∪ state) ->
    state`` must re-aggregate them — and a refresh folds only the
    appended delta:

        new_state = merge_fn(old_state ∪ partial_fn(Δbase))

    with Δbase from ``read_appended`` (manifest file-set diff). The
    view is REPLACED each refresh — correct and cheap because state is
    |keys| rows, not |base| rows; the base is never re-scanned.
    Optimistic concurrency via ``expect_version``; non-append base
    windows raise ``ValueError`` (re-bootstrap by vacating the view or
    recompute via a fresh ``partial_fn(base.read())``)."""
    m, app = _mv_state(view)
    state = app.get("mv")
    bv = base.latest_version()
    if m is None or state is None:
        result = partial_fn(base.read(spark))
        app["mv"] = {"base_version": bv}
        version = view.commit(result, mode="replace", meta={"app": app})
        return {"mode": "full", "view_version": version, "base_version": bv}
    b0 = state["base_version"]
    if b0 == bv:
        return {
            "mode": "noop",
            "view_version": m["version"],
            "base_version": bv,
        }
    delta = base.read_appended(spark, b0, bv)
    new_state = merge_fn(
        view.read(spark).unionByName(partial_fn(delta))
    )
    app["mv"] = {"base_version": bv}
    version = view.commit(
        new_state, mode="replace", expect_version=m["version"], meta={"app": app}
    )
    return {
        "mode": "incremental",
        "view_version": version,
        "base_version": bv,
    }


def refresh_join_view(
    spark: SparkSession,
    left: TransactionalTable,
    right: TransactionalTable,
    view: TransactionalTable,
    join_fn: JoinFn,
) -> dict:
    """Incrementally refresh the join view to the bases' latest
    versions. Bootstraps with a full materialization when the view has
    no recorded MV state; otherwise APPENDS only the three delta terms.

    ``join_fn`` must be a pure projection/join of its two inputs (it is
    applied to full snapshots and to deltas alike) and distributive
    over union in each argument — true of any filter/project/equi- or
    theta-join composition, NOT of aggregates or distinct (maintain
    aggregate views with ``q_incremental_agg``'s partial re-aggregation
    instead). Deletes/updates on a base table raise (see module doc).

    Raises ``CommitConflict`` if another refresher committed the view
    first — the caller re-invokes (state is re-read, so the retry
    applies exactly the remaining window)."""
    m, app = _mv_state(view)
    state = app.get("mv")
    if m is None or state is None:
        return full_refresh_join_view(spark, left, right, view, join_fn)
    l0, r0 = state["left_version"], state["right_version"]
    lv, rv = left.latest_version(), right.latest_version()
    if (l0, r0) == (lv, rv):
        return {
            "mode": "noop",
            "view_version": m["version"],
            "left_version": lv,
            "right_version": rv,
        }
    # deltas resolved from manifests; raises on non-append-only windows
    d_left = left.read_appended(spark, l0, lv)
    d_right = right.read_appended(spark, r0, rv)
    left_old = left.read(spark, version=l0)
    right_old = right.read(spark, version=r0)
    delta = (
        join_fn(d_left, right_old)
        .unionByName(join_fn(left_old, d_right))
        .unionByName(join_fn(d_left, d_right))
    )
    app["mv"] = {"left_version": lv, "right_version": rv}
    version = view.commit(
        delta,
        mode="append",
        expect_version=m["version"],
        meta={"app": app},
    )
    return {
        "mode": "incremental",
        "view_version": version,
        "left_version": lv,
        "right_version": rv,
    }
