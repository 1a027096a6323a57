"""Incremental view maintenance for JOINS (delta-join algebra).

The versioned snapshot plane (sources/versioned.py) already maintains
aggregates incrementally (partial-agg merge across snapshots); this is
the join counterpart: keep a materialized A JOIN B current across
snapshot updates touching EITHER side without re-joining the full
tables.

Identity (multiset semantics, inner equi-join), with each side's
update decomposed into added/deleted row multisets
(A_new = A_old - delA_del + delA_add):

    V_new = V_old
          - delA_del JOIN B_old
          - (A_old - delA_del) JOIN delB_del
          + (A_old - delA_del) JOIN delB_add
          + delA_add JOIN B_new

Every term joins a DELTA against one full side, so the JOIN work is
O(|delta| x match-rate), not O(|A| x |B|). The honest cost accounting
(what a 100 TB deployment actually pays per update):

* the delta computation itself scans/shuffles A_old/A_new/B_old/B_new
  once each (exceptAll plans a full-width hash aggregate) — callers
  holding CDC/changelog deltas should pass them directly via
  ``incremental_join_with_deltas`` and skip those scans entirely;
* the view correction is ONE multiset subtraction over the
  materialized view (the two delete terms are unioned first, so the
  view — the largest table in play — is shuffled once, not twice);
* join strategy for the delta terms is left to AQE: deltas are
  runtime-sized, and a forced broadcast would OOM the moment an
  update is a backfill or partition rewrite instead of a trickle
  (AQE's runtime size check makes the small-delta case a broadcast
  join anyway, without hard-failing the large-delta case).

The correction terms subtract by multiset difference (exceptAll), so
duplicate rows carry correct multiplicities throughout — tested for
exact equality against the full re-join on random add/delete
workloads. Subtraction-merge validity: the two delete terms are
disjoint by construction (a view row's A-side was either deleted, or
kept while its B-side was deleted), so their union's multiplicities
never exceed the view's and (V - X) - Y == V - (X ++ Y) holds
exactly.

Reference lineage: the reference recomputes every topology from
scratch per run (crane_master.py:148-169); incremental maintenance is
part of the added snapshot surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deltas(old: DataFrame, new: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(added, deleted) row multisets between two snapshots of one
    table — exceptAll keeps duplicate multiplicities exact."""
    return new.exceptAll(old), old.exceptAll(new)


def incremental_join(
    view_old: DataFrame,
    a_old: DataFrame,
    a_new: DataFrame,
    b_old: DataFrame,
    b_new: DataFrame,
    on: list[str],
) -> DataFrame:
    """Return A_new JOIN B_new maintained from ``view_old`` =
    A_old JOIN B_old by the signed delta identity above, computing the
    deltas from the snapshots. Column layout must match how
    ``view_old`` was produced: ``a.join(b, on)`` (join keys once, then
    A's then B's remaining columns)."""
    da_add, da_del = deltas(a_old, a_new)
    db_add, db_del = deltas(b_old, b_new)
    return incremental_join_with_deltas(
        view_old, a_old, b_old, b_new, on, da_add, da_del, db_add, db_del
    )


def incremental_join_with_deltas(
    view_old: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    b_new: DataFrame,
    on: list[str],
    da_add: DataFrame,
    da_del: DataFrame,
    db_add: DataFrame,
    db_del: DataFrame,
) -> DataFrame:
    """The maintenance core for callers that already HOLD the row
    deltas (CDC feed, changelog, versioned-snapshot diff): applies the
    signed identity without re-scanning the old/new snapshots to
    derive them — the O(|delta|) path the module docstring promises.

    The two delete terms are disjoint by construction (see module
    docstring), so they union into ONE exceptAll: the materialized
    view — the largest input — is shuffled once per update instead of
    twice. Delta-term join strategy is AQE's choice: deltas are
    runtime-sized, so a hint would either be redundant (small delta —
    AQE broadcasts it anyway) or fatal (backfill-sized delta forced
    through a driver-collected broadcast)."""
    a_kept = a_old.exceptAll(da_del)
    removed = da_del.join(b_old, on).unionAll(a_kept.join(db_del, on))
    view = view_old.exceptAll(removed)
    view = view.unionAll(a_kept.join(db_add, on))
    view = view.unionAll(da_add.join(b_new, on))
    return view
