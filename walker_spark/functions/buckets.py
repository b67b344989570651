"""Latency bucket dimension (reference ``vo/bucketlist.go:13-66``).

Ten fixed buckets over request duration; walker's summary report counts
results per (group, bucket) with percentage of group. Exposed as a CASE
expression (codegen-friendly) and as a literal rows list for a dimension
table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["BUCKETS_MS", "bucket_expr", "bucket_rows"]

# (name, from_ms, to_ms) — from exclusive, to exclusive in walker's
# comparison (result.Duration > From && result.Duration < To,
# reports/reports.go:317)
BUCKETS_MS = [
    ("awesome", 0, 50),
    ("great", 50, 100),
    ("ok, google loves you", 100, 200),
    ("not too good, but still ok", 200, 300),
    ("not great", 300, 500),
    ("bad, users start to feel a real difference", 500, 1000),
    ("really bad, you are loosing users", 1000, 3000),
    ("ouch this seems broken", 3000, 5000),
    ("catastrophic you site seems to be down", 5000, 10000),
    ("end of the world - this must not happen", 10000, 3_600_000),
]


def bucket_expr(duration_us: Column) -> Column:
    """duration → bucket name (exclusive bounds, like the reference;
    durations landing exactly on a boundary belong to no bucket and get
    NULL, faithfully reproducing reports.go:317's double-exclusive test)."""
    ms = duration_us / 1000.0
    expr = None
    for name, lo, hi in BUCKETS_MS:
        cond = (ms > lo) & (ms < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def bucket_rows() -> list[tuple[str, int, int]]:
    return [(n, lo, hi) for n, lo, hi in BUCKETS_MS]
