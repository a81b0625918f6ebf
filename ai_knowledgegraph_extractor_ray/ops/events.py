"""Event-sequence analytics: funnel progression and cohort retention.

Both are per-user computations — ONE bucketed shuffle on the user key puts
every user's events in a single merge frame, where the per-user logic is a
vectorized pandas pass (no Python loop over users). Retention needs a
second exchange, but over (cohort, offset) partial counts — a
calendar-vocabulary-sized table, tiny at any corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def funnel_stages(ds: rd.Dataset, *, user_col: str, ts_col: str,
                  type_col: str, stages: list[str],
                  out_col: str = "funnel_stage",
                  buckets: int | None = None) -> rd.Dataset:
    """Ordered funnel: stage k is reached when an event of type
    ``stages[k]`` occurs AT/AFTER the user's first qualifying stage-(k-1)
    event (cascading mins — the standard funnel semantics; equal
    timestamps count). Returns one row per user who reached stage 1:
    (user_col, out_col = deepest stage reached, 1-based int64).

    Scale shape: events are bucketed by user once; within a bucket each
    stage is a boolean-mask + groupby-min over the frame, so cost is
    O(len(stages) * bucket_rows) vectorized, never per-user Python."""
    if len(stages) < 1:
        raise ValueError("funnel needs at least one stage")
    from .agg import bucketed_groupby

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        t_prev: pd.Series | None = None
        stage_of: pd.Series | None = None
        for i, st in enumerate(stages):
            sub = df[df[type_col] == st]
            if t_prev is not None:
                prev = sub[user_col].map(t_prev)
                sub = sub[prev.notna() & (sub[ts_col] >= prev)]
            cur = sub.groupby(user_col, sort=False)[ts_col].min()
            if i == 0:
                stage_of = pd.Series(np.int64(1), index=cur.index)
            else:
                stage_of.loc[cur.index] = np.int64(i + 1)
            if len(cur) == 0:
                break
            t_prev = cur
        if stage_of is None or len(stage_of) == 0:
            return pd.DataFrame({user_col: pd.Series(dtype=df[user_col].dtype),
                                 out_col: pd.Series(dtype="int64")})
        return pd.DataFrame({user_col: stage_of.index.to_numpy(),
                             out_col: stage_of.to_numpy(dtype=np.int64)})

    return bucketed_groupby(ds, [user_col], merge, buckets=buckets)


def cohort_retention(ds: rd.Dataset, *, user_col: str, ts_col: str,
                     buckets: int | None = None) -> rd.Dataset:
    """Cohort retention matrix: cohort = calendar day of the user's first
    event; one output row per (cohort_day, day_offset) with the count of
    distinct users from that cohort active day_offset days later
    (day_offset 0 row = cohort size). Output: (cohort_day str
    'YYYY-MM-DD', day_offset int64, n_users int64).

    Two exchanges: user-bucketed distinct (a user's rows are co-located,
    so per-bucket distinct-user counts are exact partials), then a
    calendar-sized sum over (cohort, offset) partial counts."""
    from .agg import bucketed_groupby, sum_merge

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        day = df[ts_col].dt.normalize()
        first = day.groupby(df[user_col], sort=False).transform("min")
        out = pd.DataFrame({
            "_u": df[user_col].to_numpy(),
            "cohort_day": first.dt.strftime("%Y-%m-%d"),
            "day_offset": (day - first).dt.days.astype("int64"),
        }).drop_duplicates()
        part = out.groupby(["cohort_day", "day_offset"], as_index=False,
                           sort=False).agg(n_users=("_u", "size"))
        part["n_users"] = part["n_users"].astype("int64")
        return part

    partials = bucketed_groupby(ds, [user_col], per_user, buckets=buckets)
    return bucketed_groupby(partials, ["cohort_day", "day_offset"],
                            sum_merge(["cohort_day", "day_offset"],
                                      ["n_users"]))
