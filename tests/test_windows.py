"""Unit tests for the ordered/stream-shaped operators (as-of join, session
windows) — the keyed-shuffle + in-group-ordering pattern."""

import pandas as pd
import pytest


class TestAsofJoin:
    def test_matches_latest_at_or_before(self, ray_session):
        import ray.data

        from spidey_ray.stages.windows import asof_join

        left = ray.data.from_items([
            {"lid": 1, "k": 1, "ts": pd.Timestamp("2024-01-01 10:00")},
            {"lid": 2, "k": 1, "ts": pd.Timestamp("2024-01-01 12:00")},
            {"lid": 3, "k": 2, "ts": pd.Timestamp("2024-01-01 09:00")},
            {"lid": 4, "k": 3, "ts": pd.Timestamp("2024-01-01 09:00")},
        ])
        right = ray.data.from_items([
            {"rid": 10, "k": 1, "ts": pd.Timestamp("2024-01-01 09:30")},
            {"rid": 11, "k": 1, "ts": pd.Timestamp("2024-01-01 11:00")},
            {"rid": 12, "k": 2, "ts": pd.Timestamp("2024-01-01 09:00")},  # tie: <=
            {"rid": 13, "k": 2, "ts": pd.Timestamp("2024-01-01 10:00")},  # after
        ])
        out = asof_join(left, right, key="k", ts_col="ts").to_pandas()
        m = dict(zip(out["lid"], out["rid_right"]))
        assert m == {1: 10, 2: 11, 3: 12}  # lid 4: no right rows for k=3 → dropped

    def test_inner_semantics_no_prior_right(self, ray_session):
        import ray.data

        from spidey_ray.stages.windows import asof_join

        left = ray.data.from_items(
            [{"lid": 1, "k": 1, "ts": pd.Timestamp("2024-01-01 08:00")}])
        right = ray.data.from_items(
            [{"rid": 9, "k": 1, "ts": pd.Timestamp("2024-01-01 09:00")}])
        out = asof_join(left, right, key="k", ts_col="ts").to_pandas()
        assert len(out) == 0


class TestSessionize:
    def test_gap_splits_sessions(self, ray_session):
        import ray.data

        from spidey_ray.stages.windows import sessionize

        t0 = pd.Timestamp("2024-01-01 00:00:00")
        rows = [
            {"u": 1, "ts": t0},
            {"u": 1, "ts": t0 + pd.Timedelta(minutes=10)},
            {"u": 1, "ts": t0 + pd.Timedelta(minutes=50)},   # > 30min gap → new
            {"u": 2, "ts": t0},
        ]
        out = sessionize(ray.data.from_items(rows), "u", "ts",
                         gap_seconds=1800).to_pandas()
        u1 = out[out["u"] == 1].sort_values("session_id")
        assert list(u1["n_events"]) == [2, 1]
        assert list(u1["session_id"]) == [1, 2]
        assert len(out[out["u"] == 2]) == 1

    def test_exact_gap_boundary_stays_in_session(self, ray_session):
        import ray.data

        from spidey_ray.stages.windows import sessionize

        t0 = pd.Timestamp("2024-01-01")
        rows = [{"u": 1, "ts": t0},
                {"u": 1, "ts": t0 + pd.Timedelta(seconds=1800)}]  # == gap: same
        out = sessionize(ray.data.from_items(rows), "u", "ts",
                         gap_seconds=1800).to_pandas()
        assert list(out["n_events"]) == [2]


class TestTumblingWindows:
    def test_counts_and_bounds(self, ray_session):
        import ray.data

        from spidey_ray.stages.windows import tumbling_window_agg

        t0 = pd.Timestamp("2024-01-01")
        rows = [
            {"g": "a", "ts": t0 + pd.Timedelta(minutes=m), "v": float(m)}
            for m in (0, 10, 59, 60, 61, 125)
        ]
        out = tumbling_window_agg(
            ray.data.from_items(rows), "ts", "v",
            width_seconds=3600, group_cols=["g"],
        ).to_pandas().sort_values("window_start_us").reset_index(drop=True)
        assert list(out["n"]) == [3, 2, 1]
        assert out["min_v"].iloc[0] == 0.0 and out["max_v"].iloc[0] == 59.0
        assert out["sum_v"].iloc[1] == 60.0 + 61.0
        assert out["mean_v"].iloc[2] == 125.0
        # window starts are aligned hour boundaries
        hour_us = 3600 * 1_000_000
        assert all(w % hour_us == 0 for w in out["window_start_us"])

    def test_partials_merge_across_blocks(self, ray_session):
        import numpy as np
        import ray.data

        from spidey_ray.stages.windows import tumbling_window_agg

        t0 = pd.Timestamp("2024-01-01")
        df = pd.DataFrame({
            "ts": [t0 + pd.Timedelta(seconds=int(s))
                   for s in np.arange(0, 10000, 7)],
            "v": np.arange(0, 10000, 7, dtype=float),
        })
        a = tumbling_window_agg(ray.data.from_pandas(df).repartition(1),
                                "ts", "v", 1800).to_pandas()
        b = tumbling_window_agg(ray.data.from_pandas(df).repartition(13),
                                "ts", "v", 1800).to_pandas()
        key = ["window_start_us"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestHoppingWindows:
    def test_each_event_in_width_over_hop_windows(self, ray_session):
        import ray.data

        from spidey_ray.stages.windows import hopping_window_agg

        t0 = pd.Timestamp("2024-01-01 00:32:00")
        out = hopping_window_agg(
            ray.data.from_items([{"ts": t0, "v": 5.0}]),
            "ts", "v", width_seconds=3600, hop_seconds=900,
        ).to_pandas().sort_values("window_start_us").reset_index(drop=True)
        assert len(out) == 4                         # W/H = 4 windows
        assert list(out["n"]) == [1, 1, 1, 1]
        # the event's timestamp lies inside [start, start+W) for each
        us = int((t0 - pd.Timestamp(0)) / pd.Timedelta(microseconds=1))
        for w in out["window_start_us"]:
            assert w <= us < w + 3600 * 1_000_000


class TestLagDelta:
    def test_matches_pandas_groupby_shift(self, ray_session):
        import numpy as np
        import ray.data

        from spidey_ray.stages.windows import lag_delta

        rng = np.random.default_rng(23)
        n = 2000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        })
        out = (lag_delta(ray.data.from_pandas(df), "user_id", "ts", "event_id")
               .to_pandas().sort_values(["user_id", "event_id"])
               .reset_index(drop=True))
        ref = df.sort_values(["user_id", "ts", "event_id"],
                             kind="mergesort").copy()
        us = ((ref["ts"] - pd.Timestamp(0))
              // pd.Timedelta(microseconds=1)).astype("int64")
        ref["delta_us"] = (us - us.groupby(ref["user_id"]).shift(1)
                           ).fillna(-1).astype("int64")
        # duplicate (user, ts) pairs exist with prob ~0 here, but the
        # tie-break is part of the contract: compare on (user, event) keys
        ref = ref.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        assert (out["delta_us"].to_numpy()
                == ref["delta_us"].to_numpy()).all()
        assert len(out) == n

    def test_first_event_per_key_is_minus_one(self, ray_session):
        import ray.data

        from spidey_ray.stages.windows import lag_delta

        df = pd.DataFrame({
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 8, 8],
            "ts": pd.to_datetime([
                "2024-01-01 10:00", "2024-01-01 10:05",
                "2024-01-01 09:00", "2024-01-01 09:00",  # exact tie → id order
            ]),
        })
        out = (lag_delta(ray.data.from_pandas(df), "user_id", "ts", "event_id")
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        assert out["delta_us"].tolist() == [-1, 300_000_000, -1, 0]
