"""Full-text retrieval over the crawled corpus: inverted-index posting
lists and BM25 top-k search — the "search engine over the crawl" layer
(what the reference's report queries are to crawl results, these are to
page text; the public Robertson/Zaragoza BM25 and the Lucene idf
variant).

Scale shape notes
-----------------

* Tokenization is a native ``split``/``filter``/``explode`` — the text
  column never crosses an exchange; only ``(doc, token)`` pairs do.
* :func:`posting_lists` is one pair-keyed groupBy; written
  ``bucketBy(term)`` the relation IS the index (term lookups become
  bucket-pruned scans, no shuffle at query time).
* :func:`bm25_topk` filters the pair stream to the query's terms FIRST
  (a broadcast semi-join against a handful of terms), so corpus-scale
  work is one map-side-combined groupBy for document lengths plus the
  tiny filtered branch; the global top-k is ``orderBy().limit(k)`` —
  Spark's TakeOrderedAndProject, a per-partition partial top-k with no
  full sort.
* Float policy (cross-engine determinism): idf is rounded to 12
  decimals, per-term BM25 contributions are quantized to a scaled
  BIGINT grid (``floor(x*1e6 + 0.5)``) and summed as integers — integer
  addition is order-independent, so the doc score is bit-stable under
  any partitioning; ``avgdl`` is an exact long-sum ratio rounded to 6
  decimals before use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tokenize_pairs", "posting_lists", "bm25_topk"]


def tokenize_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token) pairs via the package-standard native tokenizer
    (lowercase, split on non-word runs, drop empties)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"), lambda s: s != F.lit("")
    )
    return df.select(F.col(id_col), F.explode(toks).alias("token"))


def posting_lists(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted index: one row per term with document frequency ``df``,
    collection frequency ``cf``, and the posting list rendered as the
    canonical ``"doc:tf doc:tf ..."`` string in ascending doc order
    (``array_sort`` over (doc, tf) structs — no window needed).

    The string rendering is the ARTIFACT form (ships to the oracle and
    to index dumps); at 100 TB the production index is this relation
    pre-``bucketBy(term)`` on disk, postings kept relational.
    """
    tf = (
        tokenize_pairs(df, id_col, text_col)
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col), F.col("tf")))
                ),
                lambda s: F.concat_ws(":", s[id_col].cast("string"), s["tf"]),
            ),
            " ",
        ).alias("postings"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Global top-``k`` documents for a bag-of-terms query under BM25
    (Robertson/Zaragoza 2009; Lucene's non-negative idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

    Per matched (doc, term): ``idf * tf*(k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl))``, quantized to a 1e-6 BIGINT grid and integer-summed
    per doc (order-independent — see module float policy). Ties break
    by ascending doc id. Returns ``rank, <id>, score, n_hits``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    pairs = tokenize_pairs(df, id_col, text_col)
    tf_all = pairs.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = pairs.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.avg("dl"), 6).alias("__avgdl"),
    )
    qtf = tf_all.filter(F.col("token").isin(terms))
    qdf = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        12,
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
        )
    )
    scored = (
        qtf.join(F.broadcast(qdf), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.floor(contrib * 1000000 + F.lit(0.5)).cast("long").alias("cq"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        (F.sum("cq") / 1000000).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
    )
    topk = per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        id_col,
        "score",
        "n_hits",
    )
