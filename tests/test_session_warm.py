"""The engine warm-up must actually run.

get_spark wraps the warm-up in a best-effort except (a warm-up failure
must never break session build), which also means a broken warm-up is
silent: every session then runs cold and the one-time engine costs land
in the first real query of whatever process built the session. That
exact regression shipped once — the pandas-UDF type hints inside the
warm pipeline stopped resolving under ``from __future__ import
annotations`` and the whole pipeline quietly reduced to a parquet
write — so this test drives the raising variant directly.
"""

from walker_spark.session import _warm_pipeline


def test_warm_pipeline_executes(spark):
    # raises on any breakage the get_spark wrapper would swallow
    _warm_pipeline(spark)
