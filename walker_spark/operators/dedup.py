"""Deduplication operators for training-data pipelines.

Four families, all shuffle-conscious:

* :func:`exact_dedup` — hash-groupBy on a normalized key. One shuffle.
* :func:`minhash_lsh_pairs` — shingle → minhash signature → LSH bands →
  bucket self-join → exact Jaccard verify. The signature/banding is all
  native exprs (xxhash64 with per-seed salts, aggregate/transform); the
  only shuffles are the band groupBy and the verify join, and candidate
  generation never materializes the O(n²) pair space.
* :func:`simhash_pairs` — 64-bit SimHash over token hashes, Hamming ≤ r
  via band rotation (r+1 bands: any pair within r agrees on ≥1 band).
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard on candidate pairs
  (used standalone for small scopes, and as the verifier inside LSH).

At 100 TB: shingling/minhash are per-row map work (no shuffle); band
buckets are skew-prone when many near-identical docs share a bucket —
bucket sizes are capped (``max_bucket``) with the overflow logged, the
standard guard in public LSH-dedup pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_text_expr",
    "exact_dedup",
    "shingle_expr",
    "minhash_signature_expr",
    "minhash_lsh_pairs",
    "simhash_expr",
    "simhash_pairs",
    "ngram_jaccard_pairs",
]


def normalize_text_expr(text: Column) -> Column:
    """Dedup key normalization: lowercase, collapse whitespace, strip
    punctuation."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^\w\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups on normalized text: (text_hash, n_dups,
    keep_id = min id, dup_ids). Groups of size 1 are dropped (nothing to
    dedup)."""
    key = F.xxhash64(normalize_text_expr(F.col(text_col))).alias("text_hash")
    return (
        df.select(key, F.col(id_col).cast("long").alias("id"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def shingle_expr(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle hashes (distinct), as array<long>. Native:
    split → sliding windows via transform over an index sequence →
    xxhash64 each window."""
    toks = F.filter(F.split(normalize_text_expr(text), " "), lambda s: s != F.lit(""))
    cnt = F.size(toks)
    idx = F.when(cnt >= n, F.sequence(F.lit(0), cnt - n)).otherwise(
        F.sequence(F.lit(0), F.lit(0))
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))))
    )


def minhash_signature_expr(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for seed s, min over shingles of
    xxhash64(shingle, salt_s). array<long>[num_hashes]."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(shingles, lambda h: F.xxhash64(h, s))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate pairs via MinHash+LSH, exact-Jaccard verified.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        shingle_expr(F.col(text_col), shingle_n).alias("shingles"),
    ).withColumn("sig", minhash_signature_expr(F.col("shingles"), num_hashes))

    # The band explode + bucket self-join carry (id, band, bucket) ONLY —
    # never the shingle arrays. Shuffle volume is `bands` small ints per
    # doc instead of `bands` copies of the document's feature payload
    # (at 100 TB the payload-through-bands shuffle dominates everything
    # else in the pipeline). Shingles re-join below, computed only for
    # docs that actually appear in a candidate pair.
    banded = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    # cap mega-buckets (skew guard): keep the max_bucket smallest ids
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket").orderBy("id")
    capped = banded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket
    )
    a = capped.select(F.col("band"), F.col("bucket"), F.col("id").alias("id_a"))
    b = capped.select(F.col("band"), F.col("bucket"), F.col("id").alias("id_b"))
    pair_ids = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact-Jaccard verify: shingle only the candidate docs (semi-join
    # prunes the scan before the expensive shingle projection runs)
    cand_ids = pair_ids.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("id")
    ).distinct()
    sh = (
        df.select(F.col(id_col).cast("long").alias("id"), F.col(text_col))
        .join(cand_ids, "id", "left_semi")
        .select("id", shingle_expr(F.col(text_col), shingle_n).alias("sh"))
    )
    pairs = pair_ids.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn(
            "jaccard", F.when(union > 0, F.round(inter / union, 4)).otherwise(F.lit(0.0))
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_expr(text: Column, bits: int = 64) -> Column:
    """SimHash as a ``bits``-char '0'/'1' string (MSB first).

    Single native pass: per token, explode its xxhash64 into a ±1 bit
    vector (via ``bin`` + char split — shift amounts must be literals in
    Spark, so bit access goes through the binary string); ``aggregate``
    element-wise-sums the vectors; signs concatenate into the signature.
    A string signature also makes banding a literal ``substring`` and
    keeps everything inside codegen.
    """

    def bitvec(h: Column) -> Column:
        chars = F.filter(
            F.split(F.lpad(F.bin(h), bits, "0"), ""), lambda c: c != F.lit("")
        )
        return F.transform(chars, lambda c: F.when(c == "1", 1).otherwise(-1))

    toks = F.filter(F.split(normalize_text_expr(text), " "), lambda s: s != F.lit(""))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    zero = F.array_repeat(F.lit(0), bits)
    sums = F.aggregate(hashes, zero, lambda acc, h: F.zip_with(acc, bitvec(h), lambda a, b: a + b))
    return F.concat_ws(
        "", F.transform(sums, lambda s: F.when(s > 0, "1").otherwise("0"))
    )


def hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length bit strings."""
    ca = F.filter(F.split(a, ""), lambda c: c != F.lit(""))
    cb = F.filter(F.split(b, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: F.when(x == y, 0).otherwise(1)),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Banding: split the 64-bit hash into (max_hamming+1) segments — any
    pair within distance r matches exactly on ≥1 segment (pigeonhole),
    so the bucket join finds all candidates; exact popcount verifies.
    """
    segs = max_hamming + 1
    seg_bits = 64 // segs
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        simhash_expr(F.col(text_col)).alias("sim"),
    )
    banded = base.select(
        "id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.substring(F.col("sim"), s * seg_bits + 1, seg_bits)
                    for s in range(segs)
                ]
            )
        ).alias("band", "bucket"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket").orderBy("id")
    capped = banded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket
    )
    a = capped.select("band", "bucket", F.col("id").alias("id_a"), F.col("sim").alias("sim_a"))
    b = capped.select("band", "bucket", F.col("id").alias("id_b"), F.col("sim").alias("sim_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("hamming", hamming_expr(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over ALL pairs — O(n²), the small-scope /
    test-oracle path (LSH above is the scale path)."""
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        shingle_expr(F.col(text_col), n).alias("sh"),
    )
    a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn(
            "jaccard", F.when(union > 0, F.round(inter / union, 4)).otherwise(F.lit(0.0))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
