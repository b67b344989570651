"""Document sources (S6) + the validator CLI flow.

Reference: ``htmlschema/validate.go:90-120`` fetches one document by
``file://`` or http URL and validates it (``cmd/validator``). Spark-side
the same capability is ``spark.read.format('binaryFile')`` over a path
glob → per-file validation through the same UDF as the crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_binary_docs", "validate_docs", "validate_file"]


def read_binary_docs(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path_glob)


def validate_docs(spark: SparkSession, path_glob: str, schema_html: str) -> DataFrame:
    """Validate every document under ``path_glob`` against one schema
    (the CLI's batch analogue): returns (path, score, n_violations,
    total_penalty)."""
    from ..functions.htmlschema import GroupValidator, validate_udf

    gv = GroupValidator.from_dict({"default": schema_html})
    udf = validate_udf(spark, gv)
    docs = read_binary_docs(spark, path_glob)
    rep = docs.select(
        F.col("path"),
        udf(F.lit("default"), F.col("content")).alias("report"),
    )
    return rep.select(
        "path",
        F.col("report.score").alias("score"),
        F.size(F.coalesce(F.col("report.validations"), F.array())).alias("n_violations"),
        F.coalesce(
            F.aggregate(
                F.col("report.validations"), F.lit(0), lambda acc, v: acc + v["penalty"]
            ),
            F.lit(0),
        ).alias("total_penalty"),
    )


def validate_file(path: str, schema_path: str):
    """Single-document driver-side validation (the exact CLI flow,
    ``cmd/validator/validator.go:12-52``): load schema, read file,
    validate, return the Report."""
    from ..functions.htmlschema import load_schema, validate

    schema = load_schema(schema_path)
    if path.startswith("file://"):
        path = path[len("file://") :]
    with open(path, "rb") as f:
        html = f.read().decode("utf-8", errors="replace")
    return validate(schema, html)
