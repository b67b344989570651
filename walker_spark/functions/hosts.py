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

__all__ = [
    "host_suffixes_expr",
    "host_blocklist_filter",
    "host_cap",
    "host_stats",
    "registered_domains",
    "DEFAULT_PUBLIC_SUFFIXES",
]


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


# A representative embedded subset of the public suffix list
# (publicsuffix.org, MPL-licensed DATA — these are rule STRINGS, the
# algorithm below is the PSL spec's, reimplemented). Swap in the full
# list for production; the matcher is list-size-agnostic (broadcast).
DEFAULT_PUBLIC_SUFFIXES = [
    "com", "org", "net", "edu", "gov", "int", "mil", "io", "ai", "dev",
    "de", "fr", "it", "nl", "es", "pl", "ru", "cn", "br", "in",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "ne.jp", "or.jp",
    "au", "com.au", "org.au", "net.au",
    "com.cn", "com.br",
    "github.io", "blogspot.com", "s3.amazonaws.com",
    "*.ck", "!www.ck",
]


def registered_domains(
    df: DataFrame,
    host_col: str = "host",
    suffixes: list[str] | None = None,
) -> DataFrame:
    """eTLD+1 extraction with REAL Public Suffix List semantics — the
    publicsuffix.org algorithm: among matching rules the exception
    rule prevails, else the rule with the most labels; a wildcard
    (``*.ck``) extends the matched suffix by one host label; an
    exception (``!www.ck``) strips the rule's leftmost label; no match
    falls back to the implicit ``*`` rule (rightmost label). Adds
    ``public_suffix`` and ``registered_domain`` (NULL when the host IS
    a bare public suffix).

    This is what per-domain rollups/caps should key on — naive
    "last two labels" regexes put every ``*.co.uk`` site under
    ``co.uk`` and split ``github.io`` tenants wrongly.

    Scale shape: rules compile to a broadcast match table keyed by
    their LITERAL tail; each host explodes into its O(labels)
    suffixes (the same bounded explode as the blocklist) and
    inner-joins the broadcast; the winner is picked with one max_by
    over (is_exception, effective labels, rule) — corpus rows never
    shuffle, the aggregate is host-cardinality.
    """
    rules = []
    for r in suffixes if suffixes is not None else DEFAULT_PUBLIC_SUFFIXES:
        r = r.strip().lower()
        if r.startswith("!"):
            rules.append((r[1:], 0, 1))      # key, wild, exception
        elif r.startswith("*."):
            rules.append((r[2:], 1, 0))
        else:
            rules.append((r, 0, 0))
    spark = df.sparkSession
    rtab = F.broadcast(
        spark.createDataFrame(rules, "__key string, __wild int, __exc int")
    )
    host = F.lower(F.col(host_col))
    base = df.select(host.alias("__host")).distinct()
    bparts = F.split(F.col("__host"), r"\.")
    bn = F.size(bparts)
    # every label-suffix, INCLUDING the full host (an exception rule
    # like !www.ck must match the whole host www.ck)
    cands = F.transform(
        F.sequence(F.lit(1), bn),
        lambda i: F.struct(
            F.concat_ws(".", F.slice(bparts, i, bn - i + 1)).alias("sfx"),
            (bn - i + 1).alias("nl"),
        ),
    )
    exploded = base.select(
        "__host", bn.alias("__n"), F.explode(cands).alias("c")
    ).select("__host", "__n", F.col("c.sfx").alias("__key"), F.col("c.nl").alias("__nl"))
    joined = exploded.join(rtab, "__key")
    # a wildcard rule only matches when there IS an extra label
    joined = joined.filter((F.col("__wild") == 0) | (F.col("__n") > F.col("__nl")))
    picked = joined.groupBy("__host", "__n").agg(
        F.max_by(
            F.struct("__key", "__wild", "__exc", "__nl"),
            F.struct(
                F.col("__exc"),
                (F.col("__nl") + F.col("__wild")).alias("eff"),
                F.col("__key"),
            ),
        ).alias("w")
    )
    hp = F.split(F.col("__host"), r"\.")
    ps_labels = F.when(F.col("w.__exc") == 1, F.col("w.__nl") - 1).otherwise(
        F.col("w.__nl") + F.col("w.__wild")
    )
    annotated = picked.select(
        "__host",
        "__n",
        F.concat_ws(
            ".", F.slice(hp, F.col("__n") - ps_labels + 1, ps_labels)
        ).alias("public_suffix"),
        F.when(
            F.col("__n") > ps_labels,
            F.concat_ws(
                ".", F.slice(hp, F.col("__n") - ps_labels, ps_labels + 1)
            ),
        ).alias("registered_domain"),
    )
    # implicit "*" rule for unmatched hosts: rightmost label
    fparts = F.split(host, r"\.")
    fn = F.size(fparts)
    fallback_ps = F.element_at(fparts, -1)
    fallback_rd = F.when(
        fn > 1, F.concat_ws(".", F.slice(fparts, fn - 1, 2))
    )
    return (
        df.join(
            annotated.withColumnRenamed("__host", "__h"),
            F.lower(F.col(host_col)) == F.col("__h"),
            "left",
        )
        .withColumn(
            "public_suffix", F.coalesce("public_suffix", fallback_ps)
        )
        .withColumn(
            "registered_domain",
            F.when(
                F.col("__h").isNotNull(), F.col("registered_domain")
            ).otherwise(fallback_rd),
        )
        .drop("__h", "__n")
    )
