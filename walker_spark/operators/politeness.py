"""Per-host politeness batch selection (W5 — the crown op).

Walker approximates politeness with a global concurrency cap plus
per-client busy flags (``scrapeloop.go:208-226``); the BSP engine makes
it exact: each round fetches at most ``host_budget`` URLs per host,
picked by priority ``(depth asc, link_count desc, url asc)`` — the
deterministic order SURVEY.md §5.3 pins down.

Scale design: a plain ``Window.partitionBy(host)`` serializes each hot
host onto one task — with a Zipf host distribution one mega-host would
own the round (north rule calls out explicit salting). We use exact
distributed top-k: rank within ``(host, salt)`` shards first, keep each
shard's top ``budget``, then rank the survivors per host. The per-host
top-``budget`` is always contained in the union of per-salt top-``budget``
sets, so the result is *identical* to the unsalted window while the heavy
first pass spreads over ``n_salts × hosts`` tasks. The second window only
sees ≤ ``n_salts × budget`` rows per host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["select_fetch_batch", "priority_order"]


def priority_order():
    """(depth asc, link_count desc, url asc) — SURVEY.md §5.3."""
    return [F.col("depth").asc(), F.col("link_count").desc(), F.col("url").asc()]


def select_fetch_batch(
    frontier: DataFrame,
    host_budget: int,
    n_salts: int = 8,
    record_order: bool = False,
) -> DataFrame:
    """Returns the round's fetch batch (leftover = frontier ∖ batch is the
    caller's anti-join, done against the *materialized* batch so the
    window isn't recomputed).

    ``frontier`` columns: url, host, depth, link_count. ``host_budget``
    ≤ 0 means unlimited (whole frontier fetched).

    With ``record_order`` the batch gains a round-global ``batch_pos``
    (host-ascending, then priority) — a single-partition sort used only
    by parity tests and small crawls; production leaves ordering implicit.
    """
    if host_budget <= 0:
        batch = frontier
        if record_order:
            w = Window.orderBy(F.col("host").asc(), *priority_order())
            batch = batch.withColumn("batch_pos", F.row_number().over(w) - 1)
        return batch

    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(n_salts))
    )
    w_salt = Window.partitionBy("host", "_salt").orderBy(*priority_order())
    pre = (
        salted.withColumn("_rs", F.row_number().over(w_salt))
        .filter(F.col("_rs") <= host_budget)
        .drop("_rs")
    )
    w_host = Window.partitionBy("host").orderBy(*priority_order())
    ranked = pre.withColumn("_rh", F.row_number().over(w_host))
    batch = ranked.filter(F.col("_rh") <= host_budget).drop("_salt")
    if record_order:
        w = Window.orderBy(F.col("host").asc(), *priority_order())
        batch = batch.withColumn("batch_pos", F.row_number().over(w) - 1)
    return batch.drop("_rh")
