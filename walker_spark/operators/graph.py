"""Link-graph analytics over a crawled corpus — PageRank, the classic
web-scale ranking signal (Page et al. 1999, the public construction;
also what a crawl scheduler uses for priority and what corpus curation
uses as a per-page quality prior).

Numerics are engineered for cross-engine determinism, the same
discipline as the mixture/quality ops: every intermediate rank is
QUANTIZED to 12 decimals each iteration, so the only float freedom
left (sum order inside an aggregation) is ~1e-15 per sum — eight
orders of magnitude below the quantum — and the fixpoint trajectory is
reproducible bit-for-bit on any engine that rounds half-away-from-zero
(Spark, DuckDB; NOT Python's banker's ``round``).

Scale shape per iteration (the standard distributed PageRank plan):

* ``contribs``: ranks ⋈ edges on src — one hash exchange on the id
  (both sides ids+doubles only; the edge set is pre-partitioned once
  and REUSED every iteration via ``persist``, so only the small rank
  side reshuffles);
* ``groupBy(dst).sum`` — map-side partial aggregation, one exchange;
* dangling mass: a scalar aggregate (no extra shuffle of the graph),
  redistributed uniformly per the standard formulation;
* ``localCheckpoint`` per iteration cuts the lineage exactly like the
  connected-components loop (operators/dedup.py) — constant plan size
  at any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

_Q = 12  # intermediate quantization decimals (see module docstring)


def _q(x: float) -> float:
    """Half-away-from-zero quantization to _Q decimals for x ≥ 0 —
    Python's round() is banker's and diverges from SQL round() on exact
    midpoints (the live-caught gotcha from the repetition oracle)."""
    import math

    return math.floor(x * 10.0**_Q + 0.5) / 10.0**_Q


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "s",
    dst_col: str = "t",
    id_col: str = "id",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list. ``nodes``
    (one column ``id_col``) pins the vertex set — pass it so isolated
    and dangling pages keep their (1-d)/N + dangling share; defaults to
    the ids appearing in ``edges``. Returns (id, rank) with ``rank``
    rounded to 6 decimals (quantized trajectory, see module doc)."""
    e = edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__t"))
    if nodes is None:
        nodes = (
            e.select(F.col("__s").alias(id_col))
            .union(e.select(F.col("__t").alias(id_col)))
            .distinct()
        )
    v = nodes.select(F.col(id_col).alias("__id")).distinct().persist()
    n = v.count()
    if n == 0:
        return v.select(F.col("__id").alias(id_col), F.lit(0.0).alias("rank"))

    outdeg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    # edges with the out-degree attached, partitioned once, reused per iter
    e_deg = e.join(outdeg, "__s").persist()
    e_deg.count()

    ranks = v.select("__id", F.lit(_q(1.0 / n)).alias("__r"))
    for _ in range(int(iterations)):
        contrib = (
            ranks.join(e_deg, ranks["__id"] == e_deg["__s"])
            .select(
                F.col("__t").alias("__id"),
                F.round(F.col("__r") / F.col("__deg"), _Q).alias("__c"),
            )
            .groupBy("__id")
            .agg(F.sum("__c").alias("__in"))
        )
        dangling = (
            ranks.join(outdeg, ranks["__id"] == outdeg["__s"], "left_anti")
            .agg(F.coalesce(F.sum("__r"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * _q(dangling) / n
        ranks = (
            v.join(contrib, "__id", "left")
            .select(
                "__id",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0)),
                    _Q,
                ).alias("__r"),
            )
            .localCheckpoint(eager=False)
        )
    out = ranks.select(F.col("__id").alias(id_col), F.round("__r", 6).alias("rank"))
    v.unpersist()
    return out
