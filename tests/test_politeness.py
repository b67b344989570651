"""W5 politeness-batch strategy tests (round 4).

The three strategies must pick the IDENTICAL batch (the salted two-phase
top-k is exact: the per-host top-budget is contained in the union of the
per-salt top-budgets), and ``auto`` must route on Catalyst's
windowGroupLimitThreshold — plain (optimizer-salted via map-side partial
group limits) at small budgets, explicitly salted above it.
"""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def frontier(spark):
    base = spark.range(5000)
    host = F.when(F.col("id") % 2 == 0, F.lit("hot.example")).otherwise(
        F.format_string("host-%04d.example", (F.col("id") % 7).cast("int"))
    )
    return base.select(
        F.format_string("https://%s/p/%d", host, F.col("id")).alias("url"),
        host.alias("host"),
        (F.col("id") % 3).cast("int").alias("depth"),
        ((F.col("id") * 37) % 50).cast("int").alias("link_count"),
    ).cache()


def _batch_set(df):
    return {tuple(r) for r in df.select("url", "host", "depth", "link_count").collect()}


def test_strategies_identical(frontier):
    from walker_spark.operators.politeness import select_fetch_batch

    plain = _batch_set(select_fetch_batch(frontier, 40, strategy="plain"))
    salted = _batch_set(select_fetch_batch(frontier, 40, n_salts=8, strategy="salted"))
    auto = _batch_set(select_fetch_batch(frontier, 40, strategy="auto"))
    assert plain == salted == auto
    # 8 hosts, every host has >= 40 candidates -> exact budget each
    assert len(plain) == 8 * 40


def test_auto_routes_on_group_limit_threshold(spark, frontier):
    from walker_spark.operators.politeness import (
        _window_group_limit_threshold,
        select_fetch_batch,
    )

    thr = _window_group_limit_threshold(spark)

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    below = plan(select_fetch_batch(frontier, min(40, thr), strategy="auto"))
    # optimizer-salted: partial (map-side) group limits before the exchange
    assert "WindowGroupLimit" in below
    assert "_salt" not in below
    above = plan(select_fetch_batch(frontier, thr + 1, strategy="auto"))
    # explicitly salted: the two-phase shard ranking
    assert "_salt" in above


def test_salted_exactness_under_binding_budget(frontier):
    """Budget far below per-host counts, heavy (depth, link_count) ties:
    the url-asc tiebreak makes the top-k unique, so plain and salted
    must agree element-wise even where ties are dense."""
    from walker_spark.operators.politeness import select_fetch_batch

    plain = _batch_set(select_fetch_batch(frontier, 7, strategy="plain"))
    salted = _batch_set(select_fetch_batch(frontier, 7, n_salts=4, strategy="salted"))
    assert plain == salted
    assert len(plain) == 8 * 7
