"""TableIO backend selection (the parquet/Iceberg flag, r3)."""

import pytest


def test_auto_selects_parquet_without_iceberg_catalog(spark, tmp_path):
    from walker_spark.sources.tables import (
        ParquetTableIO,
        iceberg_catalogs,
        make_table_io,
    )

    assert iceberg_catalogs(spark) == []  # no Iceberg runtime in sandbox
    io = make_table_io(spark, str(tmp_path))
    assert isinstance(io, ParquetTableIO)


def test_explicit_iceberg_fails_fast_with_setup_hint(spark, tmp_path):
    from walker_spark.sources.tables import make_table_io

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        make_table_io(spark, str(tmp_path), backend="iceberg")


def test_env_var_flag(spark, tmp_path, monkeypatch):
    from walker_spark.sources.tables import ParquetTableIO, make_table_io

    monkeypatch.setenv("SPARK_GRAFT_TABLE_BACKEND", "parquet")
    assert isinstance(make_table_io(spark, str(tmp_path)), ParquetTableIO)
    monkeypatch.setenv("SPARK_GRAFT_TABLE_BACKEND", "bogus")
    with pytest.raises(ValueError, match="unknown table backend"):
        make_table_io(spark, str(tmp_path))


def test_iceberg_catalog_detection_logic(spark):
    """iceberg_catalogs keys off spark.sql.catalog.<name> conf entries
    pointing at Iceberg's SparkCatalog — verify the parsing against the
    session's real conf list shape (no fake catalogs registered here,
    so the detection must return [] and not crash on nested keys like
    spark.sql.catalog.x.type)."""
    from walker_spark.sources.tables import iceberg_catalogs

    got = iceberg_catalogs(spark)
    assert got == []
