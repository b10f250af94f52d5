"""Gap-based sessionization of event streams.

The classic user-behavior analytic: a user's events, ordered by time,
split into sessions wherever the gap to the previous event exceeds a
timeout. Ray-Data-first shape: one `groupby(user).map_groups` — the only
shuffle co-locates each user's events, and everything inside the group
is vectorized numpy (argsort + diff + cumsum of boundary flags). The
partitioning assumption is per-user locality; skew is bounded by the
busiest single user's event count, not the table size.

Deterministic: rows order by (ts, event_id) so equal timestamps
tie-break stably, making the output reproducible and SQL-oracle-able
(LAG / SUM OVER window functions compute the same sessions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize(
    ds,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
):
    """Dataset of events -> Dataset of sessions
    (user, session_id, session_start, session_end, n_events, sum_value).

    session_id numbers a user's sessions 0..k in time order."""
    gap_us = np.int64(gap_seconds * 1_000_000)

    def per_user(batch: "pa.Table | object") -> pa.Table:
        t = batch if isinstance(batch, pa.Table) else pa.Table.from_pandas(batch)
        ts = t.column(ts_col).cast(pa.timestamp("us")).to_numpy().astype(
            "datetime64[us]"
        ).astype(np.int64)
        eid = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        vals = t.column(value_col).to_numpy(zero_copy_only=False)[order]
        user = t.column(user_col)[0].as_py()
        brk = np.zeros(len(ts), np.int64)
        if len(ts) > 1:
            brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        if not len(sid):
            return pa.table({})
        n_sessions = int(sid[-1]) + 1
        bounds = np.flatnonzero(brk)  # first index of sessions 1..k
        first = np.concatenate(([0], bounds))
        last = np.concatenate((bounds - 1, [len(ts) - 1]))
        starts, ends = ts[first], ts[last]
        counts = (last - first + 1).astype(np.int64)
        # inputs carry 2 decimals; rounding the session sum to 2 decimals
        # removes summation-order ulp so any SQL engine reproduces it
        sums = np.round(np.add.reduceat(vals, first), 2)
        return pa.table(
            {
                user_col: pa.array(np.full(n_sessions, user, np.int64)),
                "session_id": pa.array(np.arange(n_sessions, dtype=np.int64)),
                "session_start": pa.array(
                    starts.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "session_end": pa.array(
                    ends.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "n_events": pa.array(counts),
                "sum_value": pa.array(sums, pa.float64()),
            }
        )

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")


def sessionize_sql(gap_seconds: float = 1800.0) -> str:
    """DuckDB SQL computing the identical sessions over the events view."""
    gap_us = int(gap_seconds * 1_000_000)
    return f"""
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT *, SUM(brk) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM s GROUP BY user_id, session_id
""".strip()


def running_totals(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_id",
) -> "object":
    """Per-key cumulative aggregate — the `SUM(x) OVER (PARTITION BY key
    ORDER BY ts, id)` window shape. Same single co-locating shuffle as
    sessionize (groupby(key).map_groups); inside a group: one argsort +
    one np.cumsum. Integer accumulation is exact, so the result is
    bit-oracle-able against the SQL window function; float inputs share
    the same left-to-right order but engines may differ in last-ulp."""

    def per_key(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        vals = group.column(val_col).to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                key_col: group.column(key_col).take(pa.array(order)),
                id_col: pa.array(ids[order]),
                "running_total": pa.array(np.cumsum(vals)),
            }
        )

    return ds.select_columns(
        sorted({key_col, ts_col, id_col, val_col})
    ).groupby(key_col).map_groups(per_key, batch_format="pyarrow")
