"""TableIO seam: parquet now, Iceberg-ready.

The north rule specifies Iceberg tables; this sandbox ships no Iceberg
runtime jar, so the engine isolates table IO behind this seam (SURVEY.md
§7 hard-part e). ``ParquetTableIO`` implements snapshot semantics with
write-then-atomic-manifest; an Iceberg implementation would replace the
manifest dance with catalog commits (``spark.table(...)``,
``writeTo(...).createOrReplace()``) and inherit everything else.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "ParquetTableIO",
    "atomic_write_json",
    "read_json",
    "write_bucketed_table",
    "register_bucketed_table",
]


def write_bucketed_table(
    df: DataFrame,
    path: str,
    table: str = "pages_bucketed",
    buckets: int = 64,
    key: str = "url",
) -> None:
    """Write ``df`` as an external parquet table bucketed (and sorted)
    by ``key`` — the layout that makes the fetch join co-located: the
    html side needs NO exchange, NO broadcast, and (one file per bucket,
    hence the pre-repartition) no sort at join time. The Iceberg
    analogue is a ``bucket(n, url)`` partition transform.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def register_bucketed_table(
    spark: SparkSession,
    path: str,
    table: str = "pages_bucketed",
    buckets: int = 64,
    key: str = "url",
) -> DataFrame:
    """(Re-)register an existing bucketed-table directory in this
    session's catalog — bucketing metadata lives in the catalog, not the
    files, so a fresh session must re-declare it before the planner can
    use the co-located layout."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return spark.table(table)


def atomic_write_json(path: str, obj: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class ParquetTableIO:
    """Rooted parquet table store with overwrite/append-by-new-file."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> str:
        p = self.path(name)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(p)
        return p

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def read_many(self, names: list[str]) -> DataFrame:
        return self.spark.read.parquet(*[self.path(n) for n in names])

    def row_count(self, name: str) -> int:
        """Exact row count from parquet footers — driver-side metadata
        only, no Spark job. The crawl loop uses this for its per-round
        bookkeeping counts (fetched / new-links / frontier size) so a
        round costs zero count jobs. Missing dir counts as 0.

        On an object store this is one footer read per file (Iceberg
        gives the same number from snapshot manifests for free — the
        seam's Iceberg implementation would read
        ``snapshot.summary['total-records']``)."""
        import pyarrow.parquet as pq

        p = self.path(name)
        total = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS")) or (
            os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))
        )
