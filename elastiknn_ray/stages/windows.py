"""Windowed / per-group order-dependent operators (training-data pipeline
ops beyond the reference's surface; SURVEY.md §2.6 extension registry).

Both follow the engine's standard shape: ONE shuffle on a coarse hash of the
group key (all rows of a group co-locate), then a single vectorized pandas
kernel per partition — never a Python call per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _coarse(ds, keys: list[str], num_partitions: int):
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df = df.copy()
        df["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return df

    return ds.map_batches(add_part, batch_format="pandas").groupby("_part")


def sessionize(
    events,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
    num_partitions: int = 32,
):
    """Gaps-and-islands sessionization: a new session starts at each event
    whose gap from the user's previous event exceeds ``gap_us``.

    Returns (user_id, session_ix, n_events, first_event_id, last_event_id)
    with ``session_ix`` 0-based per user in time order; total order inside a
    user is (ts, event_id) so ties are deterministic.
    """

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([user_col, ts_col, id_col])
        ts = part[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        user = part[user_col].to_numpy()
        new_user = np.r_[True, user[1:] != user[:-1]]
        gap = np.r_[0, ts[1:] - ts[:-1]]
        new_session = new_user | (gap > gap_us)
        sess_grp = np.cumsum(new_session) - 1
        ids = part[id_col].to_numpy()
        df = pd.DataFrame(
            {
                user_col: user,
                "_grp": sess_grp,
                id_col: ids,
            }
        )
        g = df.groupby("_grp", sort=True)
        out = pd.DataFrame(
            {
                user_col: g[user_col].first(),
                "n_events": g[id_col].size().astype(np.int64),
                "first_event_id": g[id_col].first(),
                "last_event_id": g[id_col].last(),
            }
        ).reset_index(drop=True)
        # session_ix: 0-based per user in time order (groups are time-ordered)
        out["session_ix"] = out.groupby(user_col).cumcount().astype(np.int64)
        return out[[user_col, "session_ix", "n_events", "first_event_id", "last_event_id"]]

    return _coarse(events, [user_col], num_partitions).map_groups(
        lambda df: kernel(df.drop(columns=["_part"])), batch_format="pandas"
    )


def group_topk(
    ds,
    keys: list[str],
    order_by: list[str],
    ascending: list[bool],
    k: int,
    *,
    keep_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int = 32,
):
    """Top-k rows per key group under a total order (deterministic ranks).

    One coarse shuffle + per-partition pandas sort/groupby-head/cumcount.
    """

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(order_by, ascending=ascending)
        top = part.groupby(keys, sort=False).head(k).copy()
        top[rank_col] = top.groupby(keys, sort=False).cumcount().astype(np.int64) + 1
        return top[keep_cols + [rank_col]]

    return _coarse(ds, keys, num_partitions).map_groups(
        lambda df: kernel(df.drop(columns=["_part"])), batch_format="pandas"
    )


def trailing_window_count(
    events,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_us: int = 60 * 60 * 1_000_000,
    num_partitions: int = 32,
):
    """RANGE-window trailing count: for each event, how many of the same
    user's events fall in [ts - window, ts] (inclusive both ends — ANSI
    RANGE BETWEEN ... PRECEDING AND CURRENT ROW semantics, so equal-ts rows
    count together regardless of order).

    Same physical shape as the other windowed ops: one coarse shuffle on the
    user key, then a vectorized searchsorted sweep per partition.
    Returns (event_id, n_trailing).
    """

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([user_col, ts_col, id_col])
        ts = part[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        user = part[user_col].to_numpy()
        ids = part[id_col].to_numpy()
        if len(user) == 0:
            return pd.DataFrame(
                {id_col: ids, "n_trailing": np.empty(0, np.int64)}
            )
        # All user runs at once (no per-group Python): remap each run's
        # timestamps onto one globally sorted axis by adding a per-run base
        # that leaves a > window_us gap between consecutive runs, so a
        # single pair of searchsorted sweeps answers every run and a query
        # (t - window) can never reach into the previous user's run.
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        ends = np.r_[starts[1:], len(user)]
        run_of_row = np.cumsum(np.r_[False, user[1:] != user[:-1]])
        span = ts[ends - 1] - ts[starts]  # per-run duration (>= 0)
        base = np.zeros(len(starts), dtype=np.int64)
        np.cumsum(span[:-1] + (window_us + 1), out=base[1:])
        if len(starts) and base[-1] + span[-1] > (1 << 62):
            # Pathological cumulative span (would overflow int64 headroom):
            # fall back to the per-run sweep — correctness over speed.
            n = np.empty(len(user), dtype=np.int64)
            for s, e in zip(starts, ends):
                t = ts[s:e]
                lo = np.searchsorted(t, t - window_us, side="left")
                hi = np.searchsorted(t, t, side="right")
                n[s:e] = hi - lo
            return pd.DataFrame({id_col: ids, "n_trailing": n})
        shifted = base[run_of_row] + (ts - ts[starts][run_of_row])
        lo = np.searchsorted(shifted, shifted - window_us, side="left")
        hi = np.searchsorted(shifted, shifted, side="right")
        return pd.DataFrame({id_col: ids, "n_trailing": hi - lo})

    return _coarse(events, [user_col], num_partitions).map_groups(
        lambda df: kernel(df.drop(columns=["_part"])), batch_format="pandas"
    )
