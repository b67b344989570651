"""Partitioned Bloom URL-seen filter + exact anti-join (J2).

Walker dedups with two in-memory hash maps (``scrapeloop.go:361-367``:
enqueue iff ∉ results ∧ ∉ jobs). At 10^10 URLs an exact driver-side set
is impossible, so the north rule prescribes: a Bloom filter sharded by
``host_hash`` partition, merged via ``treeAggregate``, as a *prefilter*,
with an exact ``left_anti`` join as the authority. Bloom semantics make
this exactly correct:

* bloom says NO  → URL definitely unseen → keep, skip the join;
* bloom says YES → maybe seen → route through the exact anti-join.

False positives only cost join traffic, never a dropped URL; false
negatives don't exist. The anti-join input shrinks to (new ∩ maybe-seen),
which after a few rounds is a small fraction of the candidate set.

Shards are numpy bit arrays (P shards × m bits, k hashes), built and
incrementally extended with ``RDD.treeAggregate`` (depth 2) so merge
traffic is executor→executor tree-shaped, not all-to-driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.hashing import stable_hash64

__all__ = ["BloomShards", "split_by_bloom", "seen_anti_join"]


class BloomShards:
    """P Bloom shards; shard = stable_hash64(url) % P (the engine's
    host-hash partitioning uses the same url-hash family, so a shard maps
    onto a frontier partition)."""

    def __init__(self, n_shards: int = 32, bits_per_shard: int = 1 << 20, n_hashes: int = 5):
        self.n_shards = n_shards
        self.bits = bits_per_shard
        self.k = n_hashes
        self.arrays = np.zeros((n_shards, bits_per_shard // 8), dtype=np.uint8)
        self.count = 0

    @classmethod
    def sized_for(cls, expected: int, n_shards: int = 32, fpp: float = 0.01) -> "BloomShards":
        expected = max(expected, 1024)
        m_total = int(-expected * math.log(fpp) / (math.log(2) ** 2))
        per_shard = max(1 << 14, 1 << math.ceil(math.log2(max(1, m_total // n_shards))))
        k = max(1, round(m_total / expected * math.log(2)))
        return cls(n_shards, per_shard, min(k, 8))

    # -- pure bit math (runs on executors inside treeAggregate/UDFs) --
    def _positions(self, url: str) -> tuple[int, np.ndarray]:
        h = stable_hash64(url)
        shard = h % self.n_shards
        h1 = h >> 6
        h2 = stable_hash64("b2:" + url) | 1
        idx = (h1 + np.arange(self.k, dtype=np.uint64) * np.uint64(h2 & 0xFFFFFFFF)) % np.uint64(self.bits)
        return shard, idx.astype(np.int64)

    def add(self, url: str) -> None:
        shard, idx = self._positions(url)
        np.bitwise_or.at(self.arrays[shard], idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        self.count += 1

    def contains(self, url: str) -> bool:
        shard, idx = self._positions(url)
        bits = (self.arrays[shard, idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return bool(bits.all())

    def merge(self, other: "BloomShards") -> "BloomShards":
        np.bitwise_or(self.arrays, other.arrays, out=self.arrays)
        self.count += other.count
        return self

    # -- distributed build --
    def add_urls_distributed(self, urls_df: DataFrame, depth: int = 2) -> "BloomShards":
        """OR-in every url of ``urls_df`` (column ``url``) via
        treeAggregate: per-partition local blooms, tree-merged."""
        params = (self.n_shards, self.bits, self.k)

        def seq_op(acc: BloomShards | None, row) -> BloomShards:
            if acc is None:
                acc = BloomShards(*params)
            acc.add(row[0])
            return acc

        def comb_op(a: BloomShards | None, b: BloomShards | None):
            if a is None:
                return b
            if b is None:
                return a
            return a.merge(b)

        delta = urls_df.select("url").rdd.treeAggregate(None, seq_op, comb_op, depth=depth)
        if delta is not None:
            self.merge(delta)
        return self


def split_by_bloom(cands: DataFrame, bloom: BloomShards, key: str = "url") -> DataFrame:
    """Adds ``maybe_seen`` (bool) from the broadcast bloom shards,
    probing on the ``key`` column."""
    spark = cands.sparkSession
    bc = spark.sparkContext.broadcast((bloom.n_shards, bloom.bits, bloom.k, bloom.arrays))

    @pandas_udf("boolean")
    def maybe_seen(urls: pd.Series) -> pd.Series:
        n_shards, bits, k, arrays = bc.value
        probe = BloomShards(n_shards, bits, k)
        probe.arrays = arrays
        return pd.Series([probe.contains(u) for u in urls])

    return cands.withColumn("maybe_seen", maybe_seen(F.col(key)))


def seen_anti_join(
    cands: DataFrame, seen: DataFrame, bloom: BloomShards | None, key: str = "url"
) -> DataFrame:
    """The correctness-critical J2: candidates that are genuinely new.

    ``cands``: one row per distinct candidate, keyed by ``key`` (the raw
    normalized url, or the canonical form in north-rule canonical mode).
    ``seen``: the exact seen table (column ``url`` holding the same key
    kind). With a bloom, only the maybe-seen slice pays the shuffle; the
    bloom-negative slice unions in for free.
    """
    s = seen.select(F.col("url").alias("_seen_key"))
    if bloom is None:
        return cands.join(s, cands[key] == s["_seen_key"], "left_anti")
    tagged = split_by_bloom(cands, bloom, key)
    fresh = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified = maybe.join(s, maybe[key] == s["_seen_key"], "left_anti")
    return fresh.unionByName(verified)
