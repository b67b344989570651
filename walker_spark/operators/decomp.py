"""Distributed spectral decomposition over embedding columns — the
covariance-free power iteration (the textbook construction: v ←
normalize(Xᵀ(Xv))), which is how you get principal directions out of a
100 TB embedding table without ever materializing a d×d covariance or
calling LAPACK on the driver.

Cross-engine determinism is the engineering content here, one notch
past HITS: EVERY cross-row and cross-dimension sum rides a scaled-
BIGINT grid (element products half-away-quantized, then integer-summed
— order-free exactly), the only transcendental is sqrt (correctly
rounded by IEEE-754, so bit-identical on any conforming engine), and
the iterate re-quantizes to the 1e-9 grid each round. The whole
trajectory — including the driver-side normalization arithmetic — is
therefore replayable relationally, which is what the DuckDB oracle
does.

Scale shape per iteration: one projection computes per-row scores
(array fold, no shuffle), one posexplode→groupBy(dim) integer
aggregation (d-cardinality result — 64 rows — the only exchange), and
a d-sized driver collect for the normalization (the same bounded-
scalar pattern as PageRank's dangling mass). Rows of X never shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["power_iteration_pc1"]

_G9 = 1_000_000_000  # iterate / product grid
_G6 = 1_000_000      # cross-row contribution grid


def _q(x: float, grid: int) -> float:
    return math.copysign(math.floor(abs(x) * grid + 0.5), x) / grid


def _qcol(col, grid: int):
    """sign-aware half-away quantization of a double column to a
    scaled BIGINT — the shared exact-summation currency."""
    return (F.signum(col) * F.floor(F.abs(col) * grid + F.lit(0.5))).cast(
        "long"
    )


def power_iteration_pc1(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 3,
) -> DataFrame:
    """Top principal direction of the (uncentered) embedding matrix by
    ``iterations`` rounds of power iteration. Returns one row per input
    vector: ``(id, pc1, eigenvalue)`` where ``pc1`` is the vector's
    projection onto the final iterate (1e-9 grid) and ``eigenvalue``
    the final pre-normalization L2 norm (6-dec) — the dominant
    eigenvalue estimate of XᵀX under the iteration's scaling.

    Start vector is the quantized uniform direction ``1/d``; for
    eigen-spectra where that is orthogonal to the dominant direction
    (measure-zero in practice) pass more iterations or pre-rotate.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, pc1 double, eigenvalue double"
        )
    d = first["d"]
    xd = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__x"),
    ).persist()
    xd.count()

    v = [_q(1.0 / d, _G9)] * d
    norm = 0.0
    for _ in range(int(iterations)):
        v_arr = F.array(*[F.lit(float(x)) for x in v])
        score_q = F.aggregate(
            F.zip_with(F.col("__x"), v_arr, lambda x, vj: _qcol(x * vj, _G9)),
            F.lit(0).cast("long"),
            lambda acc, e: acc + e,
        )
        score = (score_q / _G9).alias("__s")
        contrib = xd.select(
            F.posexplode(
                F.transform(
                    F.col("__x"), lambda x: _qcol(x * score_q / _G9, _G6)
                )
            ).alias("__j", "__c")
        )
        sums = {
            r["__j"]: r["s"]
            for r in contrib.groupBy("__j")
            .agg(F.sum("__c").alias("s"))
            .collect()
        }
        w = [sums.get(j, 0) / _G6 for j in range(d)]
        sumsq_q = sum(math.floor(wj * wj * _G6 + 0.5) for wj in w)
        norm = math.sqrt(sumsq_q / _G6)
        if norm == 0.0:
            break
        v = [_q(wj / norm, _G9) for wj in w]

    v_arr = F.array(*[F.lit(float(x)) for x in v])
    proj_q = F.aggregate(
        F.zip_with(F.col("__x"), v_arr, lambda x, vj: _qcol(x * vj, _G9)),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    out = xd.select(
        F.col(id_col),
        (proj_q / _G9).alias("pc1"),
        F.lit(_q(norm, _G6)).alias("eigenvalue"),
    )
    xd.unpersist()
    return out
