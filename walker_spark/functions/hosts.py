"""Host/domain-level corpus curation — the URL-side gates of a
web-scale text pipeline (the C4 recipe filters on domain blocklists;
Common-Crawl-derived corpora cap per-host contributions to stop a few
mega-hosts dominating the token budget).

Everything is suffix-of-labels semantics (``"spam.example"`` blocks
``a.spam.example`` and ``spam.example`` but NOT ``notspam.example``) —
the same longest-match-wins flavor as the robots matcher in
``functions/robots.py``.

Scale shape: the blocklist is small by construction (even industry
lists are ~1e6 rows ≈ a few MB) so it is ``broadcast()``; the corpus
explodes each host into its O(labels) suffixes (a bounded ~4-6 per
host) and inner-joins the broadcast — the corpus itself crosses ZERO
exchanges; only the matched (id, rule) pairs are aggregated, and that
set is blocked-docs-sized. Host capping is the stratified-sample
window (map-side partial top-k via Catalyst's InsertWindowGroupLimit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["host_suffixes_expr", "host_blocklist_filter", "host_cap", "host_stats"]


def host_suffixes_expr(host: Column, min_labels: int = 2) -> Column:
    """All dot-suffixes of a hostname with ≥ ``min_labels`` labels,
    longest first: ``a.b.example`` → [``a.b.example``, ``b.example``].
    Native (split/sequence/transform), no Python."""
    parts = F.split(F.lower(host), r"\.")
    n = F.size(parts)
    idx = F.when(
        n >= min_labels, F.sequence(F.lit(1), n - min_labels + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(".", F.slice(parts, i, n - i + 1)))


def host_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate each row with ``blocked`` and ``matched_rule`` (the
    LONGEST matching blocklist entry — most specific wins, ties broken
    lexicographically so the answer is deterministic). ``blocklist``
    has one column ``rule`` of domain suffixes.

    The corpus never shuffles: suffix-explode → broadcast inner join →
    blocked-ids-only groupBy → AQE-broadcast annotation join back.
    """
    rules = F.broadcast(
        blocklist.select(F.lower(F.col("rule")).alias("__rule")).distinct()
    )
    matches = (
        df.select(
            F.col(id_col),
            F.explode(host_suffixes_expr(F.col(host_col))).alias("__rule"),
        )
        .join(rules, "__rule")
        .groupBy(id_col)
        .agg(
            F.max(F.struct(F.length("__rule").alias("l"), F.col("__rule").alias("r")))
            .alias("__m")
        )
        .select(F.col(id_col), F.col("__m.r").alias("matched_rule"))
    )
    return (
        df.join(matches, id_col, "left")
        .withColumn("blocked", F.col("matched_rule").isNotNull())
    )


def host_cap(
    df: DataFrame,
    max_per_host: int,
    host_col: str = "host",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``max_per_host`` docs per host, chosen by the
    deterministic md5(seed:id) rank (reproducible across runs and
    cluster sizes — NOT "first N seen", which depends on partition
    order). Same window shape as stratified_sample: row_number ≤ k
    rides Catalyst's map-side partial top-k, so a mega-host never
    materializes its full row set on one task."""
    from .text import stratified_sample

    return stratified_sample(
        df, strata_cols=(host_col,), k=max_per_host, id_col=id_col, seed=seed
    )


def host_stats(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    registered_labels: int = 2,
) -> DataFrame:
    """Per-registered-domain rollup (docs, tokens, distinct full
    hosts) — the mixing/monitoring table of a crawl corpus. The
    "registered domain" is the last ``registered_labels`` labels (a
    public-suffix list would refine multi-label TLDs; that refinement
    is a data change, not a plan change). One map-side-combined
    groupBy; output is domains-sized."""
    from .text import token_count_expr

    parts = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(parts)
    reg = F.concat_ws(
        ".", F.slice(parts, F.greatest(n - registered_labels + 1, F.lit(1)), n)
    )
    return (
        df.select(
            reg.alias("registered_domain"),
            F.lower(F.col(host_col)).alias("__host"),
            token_count_expr(F.col(text_col)).cast("long").alias("__tok"),
        )
        .groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
            F.count_distinct("__host").alias("n_hosts"),
        )
    )
