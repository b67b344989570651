"""Streaming re-crawl scheduling — the live counterpart of
``pipeline.py::recrawl_schedule``: the continuous crawl emits a
(page, round, changed) observation stream (chained ``corpus_diff``
batches, or the fetcher's own change bit), and the scheduler must keep
every page's revisit interval current WITHOUT re-aggregating history.

State per page is three integers (observations, changes, last round);
the emitted row recomputes the SAME power-of-two interval arithmetic
as the batch op — integer end to end, so a replayed stream's final
per-page rows equal the batch answer exactly (proven by
test_streaming_recrawl). NoTimeout: the schedule is the product, not
a windowed aggregate; state is frontier-cardinality by construction.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_recrawl_schedule"]


def streaming_recrawl_schedule(
    stream: DataFrame,
    id_col: str = "doc_id",
    round_col: str = "round",
    changed_col: str = "changed",
    min_interval: int = 1,
    max_interval: int = 64,
) -> DataFrame:
    """Emit ``(id, n_obs, n_changes, change_rate, revisit_interval,
    due_round)`` — the batch op's exact columns — whenever a page
    receives new observations."""
    if min_interval < 1 or max_interval < min_interval:
        raise ValueError("need 1 <= min_interval <= max_interval")
    from pyspark.sql.streaming.state import GroupStateTimeout

    powers = []
    p = 1
    while p <= max_interval:
        if p >= min_interval:
            powers.append(p)
        p *= 2

    ev = stream.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(round_col).cast("long").alias("round"),
        F.col(changed_col).cast("boolean").alias("changed"),
    )

    def fn(key, pdfs, state):
        n_obs, n_changes, last_round = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            for rnd, ch in zip(pdf["round"], pdf["changed"]):
                n_obs += 1
                n_changes += int(bool(ch))
                last_round = max(last_round, int(rnd))
        state.update((n_obs, n_changes, last_round))
        x = (n_obs + 2) // (n_changes + 1)
        interval = powers[0]
        for pw in powers[1:]:
            if x >= pw:
                interval = pw
        rate = math.floor((n_changes + 1.0) / (n_obs + 2.0) * 1e6 + 0.5) / 1e6
        yield pd.DataFrame(
            {
                "id": [key[0]],
                "n_obs": [n_obs],
                "n_changes": [n_changes],
                "change_rate": [rate],
                "revisit_interval": [interval],
                "due_round": [last_round + interval],
            }
        )

    return ev.groupBy("id").applyInPandasWithState(
        fn,
        outputStructType=(
            "id long, n_obs long, n_changes long, change_rate double,"
            " revisit_interval long, due_round long"
        ),
        stateStructType="n_obs long, n_changes long, last_round long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
