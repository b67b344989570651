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

__all__ = ["ParquetTableIO", "atomic_write_json", "read_json"]


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

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS")) or (
            os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))
        )
