"""Ordered/stream-shaped operators Ray Data lacks natively: as-of join and
session windows (SURVEY.md §2 "custom operators" note; ray_guide.md
"Streaming-shaped workloads").

Both follow the documented partitioning assumption: all rows for one key are
co-located by the ``groupby(key)`` shuffle, and ordering within the key is
established inside the group (sort by timestamp) — the engine never relies
on global order.  At cluster scale these are the standard bucket-join /
keyed-window shapes; skewed keys can be salted upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts_col: str,
    right_ts_col: str | None = None,
    suffix: str = "_right",
) -> "ray.data.Dataset":
    """For each left row, the latest right row of the same key with
    right.ts <= left.ts (inner: left rows with no match are dropped).

    Implementation: tag both sides, co-partition with one ``groupby(key)``
    shuffle, and walk each group with numpy ``searchsorted`` over the sorted
    right timestamps — the per-bucket ``merge_asof`` pattern."""
    rts = right_ts_col or ts_col

    l_tag = left.map_batches(
        lambda df: df.assign(_side=0), batch_format="pandas")
    r_tag = right.map_batches(
        lambda df: df.assign(_side=1).rename(
            columns={rts: ts_col} if rts != ts_col else {}),
        batch_format="pandas")

    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names if c not in (key, rts)]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].sort_values(ts_col, kind="mergesort")
        rg = g[g["_side"] == 1].sort_values(ts_col, kind="mergesort")
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=left_cols + [c + suffix for c in right_cols])
        r_ts = rg[ts_col].to_numpy()
        idx = np.searchsorted(r_ts, lg[ts_col].to_numpy(), side="right") - 1
        ok = idx >= 0
        lg = lg[ok]
        matched = rg.iloc[idx[ok]]
        out = lg[left_cols].reset_index(drop=True)
        for c in right_cols:
            out[c + suffix] = matched[c].to_numpy()
        return out

    return l_tag.union(r_tag).groupby(key).map_groups(
        per_key, batch_format="pandas")


def sessionize(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
) -> "ray.data.Dataset":
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``.  Emits one row per session:
    (key, session_id (1-based per key in time order), session_start_epoch,
    n_events)."""

    gap_us = int(gap_seconds * 1_000_000)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        # exact integer microseconds: no float-epoch rounding ambiguity
        us = (
            (g[ts_col] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).astype("int64").to_numpy()
        brk = np.ones(len(us), dtype=np.int64)
        brk[1:] = (us[1:] - us[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        out = pd.DataFrame({key: g[key].to_numpy(), "session_id": sid, "us": us})
        agg = out.groupby([key, "session_id"], as_index=False).agg(
            session_start_us=("us", "min"), n_events=("us", "size"))
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
