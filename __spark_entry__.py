"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a BSP crawl (walker_spark.plans.crawl) over
a pages table derived deterministically from ``documents.parquet``,
returning the A1 status histogram of the crawl results.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (re-expressed over the driver's pre-registered tables
where the crawl tables aren't available to the DuckDB oracle, per
FIXTURES.md §7) plus the training-data operators. Every aggregate /
computed column is aliased identically on both sides. As of r3 every
entry has a full DuckDB oracle — LSH via the exact-jaccard pair set
(recall 1.0 pinned by tests), SimHash/fingerprint via the shared
md5-prefix hash family, language ID via the trigram heuristic in SQL.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_pages(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[str]]:
    """Deterministic pages table derived from ``documents``: one page per
    doc at ``https://{source}.example/d/{doc_id}.html``; outlinks to the
    next 3 docs of the same source (by doc_id order) — but only when
    ``doc_id % 7 < 4``, so link chains break and the reachable set is a
    non-trivial fixpoint (SQL oracle: recursive CTE)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    d = docs.select(
        "doc_id",
        "source",
        "text",
        F.lead("doc_id", 1).over(w).alias("n1"),
        F.lead("doc_id", 2).over(w).alias("n2"),
        F.lead("doc_id", 3).over(w).alias("n3"),
    )
    link = lambda c: F.when(  # noqa: E731
        c.isNotNull(), F.format_string('<a href="/d/%d.html">n</a>', c)
    ).otherwise(F.lit(""))
    # every 11th doc also links to a nonexistent /dead/ page, so the
    # crawl produces 404s and the broken-links back-join has work
    dead = F.when(
        F.col("doc_id") % 11 == 0,
        F.format_string('<a href="/dead/%d.html">x</a>', F.col("doc_id")),
    ).otherwise(F.lit(""))
    links_html = F.concat(
        F.when(
            F.col("doc_id") % 7 < 4,
            F.concat(link(F.col("n1")), link(F.col("n2")), link(F.col("n3"))),
        ).otherwise(F.lit("")),
        dead,
    )
    pages = d.select(
        F.format_string("https://%s.example/d/%d.html", F.col("source"), F.col("doc_id")).alias("url"),
        # host must equal the URL authority — the fetch stage's dynamic
        # host pruning filters the pages scan on it
        F.concat(F.col("source"), F.lit(".example")).alias("host"),
        F.concat(
            F.format_string(
                "<html><head><title>Doc %d</title></head><body><h1>Doc %d</h1><p>",
                F.col("doc_id"),
                F.col("doc_id"),
            ),
            F.col("text"),
            F.lit("</p>"),
            links_html,
            F.lit("</body></html>"),
        ).cast("binary").alias("html"),
    )
    seeds = [
        f"https://{r['source']}.example/d/{r['mn']}.html"
        for r in docs.groupBy("source").agg(F.min("doc_id").alias("mn")).collect()
    ]
    return pages, sorted(seeds)


_CRAWL_CACHE: dict = {}


def _run_doc_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key in _CRAWL_CACHE:
        return _CRAWL_CACHE[key]
    df = _run_doc_crawl_uncached(spark, sf_dir)
    _CRAWL_CACHE[key] = df
    return df


def _run_doc_crawl_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from walker_spark.config import CrawlConfig, Target
    from walker_spark.plans.crawl import Crawler

    pages, seeds = _docs_pages(spark, sf_dir)
    conf = CrawlConfig(
        target=Target(base_url="https://crawl.example", paths=["/"]),
        host_budget=0,  # unlimited per round: pure BFS
        agent="walker-spark",
    )
    ckpt = tempfile.mkdtemp(prefix="walker_spark_entry_")
    crawler = Crawler(
        spark,
        conf,
        pages=pages,
        redirect_edges=None,
        robots_bodies={},
        checkpoint_dir=ckpt,
        multi_host=True,
        seeds=seeds,
        use_bloom=False,  # tiny crawl; bloom build costs more than it saves
    )
    crawler.run()
    return crawler.results_df()


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BSP crawl over the documents-derived pages table at
    sf0.001, returning the status-code histogram (A1) of the results."""
    from walker_spark.operators.reports import status_histogram

    return status_histogram(_run_doc_crawl(spark, DEFAULT_SF))


# ---------------------------------------------------------------- queries

def q_crawl_status_histogram(spark, sf):
    from walker_spark.operators.reports import status_histogram

    return status_histogram(_run_doc_crawl(spark, sf)).select(
        "code", F.col("cnt").cast("long").alias("cnt")
    )


def q_crawl_broken_links(spark, sf):
    """J3 over the crawl's own results: 404 targets back-joined to the
    pages linking to them (oracle: recursive reachability + chain-end
    dead links in SQL)."""
    from walker_spark.operators.reports import links_edges

    res = _run_doc_crawl(spark, sf)
    edges = links_edges(res)
    broken = res.filter(F.col("code") == 404).select(F.col("url").alias("dst_url"))
    return (
        broken.join(edges, "dst_url", "left")
        .groupBy("dst_url")
        .agg(
            F.concat_ws(
                ",", F.slice(F.sort_array(F.collect_list("src_url")), 1, 20)
            ).alias("sources"),
            F.count("src_url").alias("n_sources"),
        )
        .orderBy("dst_url")
    )


def q_crawl_reverse_links(spark, sf):
    """J4 over the crawl's results: where is each URL linked from."""
    from walker_spark.operators.reports import reverse_links

    res = _run_doc_crawl(spark, sf)
    rl = reverse_links(res)
    return rl.select(
        "url",
        F.concat_ws(",", F.col("linked_from")).alias("linked_from"),
        F.size("linked_from").cast("long").alias("n_links"),
    ).orderBy("url")


def q_crawl_fetch_batch(spark, sf):
    """W5 — the crown op (VERDICT r3 #2): one politeness round's fetch
    batch through the PRODUCTION salted exact-top-k operator
    (politeness.select_fetch_batch, n_salts=8), oracled against the
    plain unsalted SQL window — the equality IS the salting-identity
    proof on real data. The frontier derives deterministically from
    documents with a deliberately hot host (every even doc_id lands on
    hot.example ≈ half the frontier — the Zipf scenario the salting
    exists for) and heavy (depth, link_count) ties so the url-asc
    tiebreak is load-bearing."""
    from walker_spark.operators.politeness import select_fetch_batch

    docs = _t(spark, sf, "documents")
    host = F.when(F.col("doc_id") % 2 == 0, F.lit("hot.example")).otherwise(
        F.concat(F.col("source"), F.lit(".example"))
    )
    frontier = docs.select(
        F.format_string("https://%s/d/%d.html", host, F.col("doc_id")).alias("url"),
        host.alias("host"),
        (F.col("doc_id") % 3).cast("long").alias("depth"),
        ((F.col("doc_id") % 7) * 3).cast("long").alias("link_count"),
    )
    return select_fetch_batch(
        frontier, host_budget=16, n_salts=8, strategy="salted"
    ).select("url", "host", "depth", "link_count").orderBy("url")


def q_crawl_link_filters(spark, sf):
    """F1-F9 native filter stack oracled end-to-end (VERDICT r3 #3):
    one round's ``link_candidates`` output over a deterministic
    documents-derived page set whose raw hrefs exercise EVERY filter —
    fragment strip (F1, via the real ``normalize_link``), pager links
    (F2), external host + wrong scheme (F3), depth (F4), ignore prefix
    (F5), robots Disallow (F6), query-name filter (F7), include
    prefixes (F8), page nofollow (F9) — plus the min-depth/sum-count
    frontier merge. The DuckDB oracle re-derives normalization and
    every predicate in SQL over the same exploded href set; today
    F2-F9 otherwise rest on the property-test spec only."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from walker_spark.config import CrawlConfig, Target
    from walker_spark.plans.crawl import link_candidates

    docs = _t(spark, sf, "documents")
    # raw hrefs per source page; every template targets one filter
    raws = F.array(
        F.format_string("/d/%d.html#frag", F.col("doc_id") + 1),  # F1 survivor
        F.format_string("/d/%d.html", F.col("doc_id") + 1),  # dup → link_count
        F.format_string("/d/%d.html", F.col("doc_id") + 2),  # cross-page merge
        F.format_string("/d/%d.html?x=1&y=2", F.col("doc_id") + 3),  # F7 pass
        F.format_string("/d/%d.html?session=abc", F.col("doc_id") + 2),  # F7 drop
        F.format_string("https://other.example/d/%d.html", F.col("doc_id")),  # F3 host
        F.format_string("http://%s.example/d/%d.html", F.col("source"), F.col("doc_id")),  # F3 scheme
        F.format_string("/d/a/b/c/%d.html", F.col("doc_id")),  # F4 depth>3
        F.format_string("/private/%d.html", F.col("doc_id")),  # F5
        F.format_string("/list/%d.html", F.col("doc_id")),  # F8
        F.format_string("/d/next/%d.html", F.col("doc_id")),  # F2 pager
        F.format_string("/blocked/%d.html", F.col("doc_id")),  # F6 robots
    )
    pages = docs.select(
        F.format_string(
            "https://%s.example/d/%d.html", F.col("source"), F.col("doc_id")
        ).alias("url"),
        F.concat(F.col("source"), F.lit(".example")).alias("host"),
        (F.col("doc_id") % 3).cast("int").alias("depth"),
        raws.alias("raw_links"),
        F.format_string("/d/next/%d.html", F.col("doc_id")).alias("raw_next"),
        F.struct(
            F.when(F.col("doc_id") % 5 == 0, F.lit("nofollow"))
            .otherwise(F.lit(""))
            .alias("robots")
        ).alias("structure"),
    )

    # NOTE: no pd.Series annotations — __future__ annotations in this
    # module stringifies them and pandas_udf can't resolve the local pd
    @pandas_udf("array<string>")
    def norm_links(base, links):
        from walker_spark.urlnorm import normalize_link

        out = []
        for b, ls in zip(base, links):
            ns = [normalize_link(b, l) for l in (ls if ls is not None else [])]
            out.append([n for n in ns if n is not None])
        return pd.Series(out)

    @pandas_udf("string")
    def norm_one(base, link):
        from walker_spark.urlnorm import normalize_link

        return pd.Series([normalize_link(b, l) or "" for b, l in zip(base, link)])

    results_new = pages.select(
        "url",
        "host",
        "depth",
        norm_links(F.col("url"), F.col("raw_links")).alias("link_norms"),
        norm_one(F.col("url"), F.col("raw_next")).alias("link_next_norm"),
        F.lit("").alias("link_prev_norm"),
        "structure",
    )
    conf = CrawlConfig(
        target=Target(base_url="https://unused.example", paths=["/d/", "/blocked/"]),
        depth=3,
        ignore=["/private/"],
        ignore_queries_with=["session"],
        agent="walker-spark",
    )
    hosts = [r["source"] + ".example" for r in docs.select("source").distinct().collect()]
    robots_bodies = {h: "User-agent: *\nDisallow: /blocked/" for h in hosts}
    cand = link_candidates(results_new, conf, robots_bodies, spark)
    return cand.select(
        "url", "host", F.col("depth").cast("long").alias("depth"),
        F.col("link_count").cast("long").alias("link_count"),
    ).orderBy("url")


def q_a1_event_histogram(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


def q_a2_latency_buckets(spark, sf):
    from walker_spark.functions.buckets import bucket_expr

    ev = _t(spark, sf, "events").withColumn(
        "duration_us", (F.col("value") * 50_000).cast("long")
    )
    w = Window.partitionBy("event_type")
    return (
        ev.withColumn("bucket", bucket_expr(F.col("duration_us")))
        .filter(F.col("bucket").isNotNull())
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("pct", F.round(F.col("cnt") / F.sum("cnt").over(w) * 100))
        .orderBy("event_type", "bucket")
    )


def q_a3_group_counts(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy(F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderpriority")
    )


def q_a4_minmax(spark, sf):
    return _t(spark, sf, "events").agg(
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


def q_a12_quantiles(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_quantity", F.lit(0.99)), 4).alias("p99"),
    )


def q_w1_highscore(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.orderBy(F.col("value").asc(), F.col("event_id").asc())
    return (
        ev.select("event_id", F.round("value", 2).alias("value"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
    )


def q_w3_pagination(spark, sf):
    c = _t(spark, sf, "customer")
    w = Window.orderBy(F.col("c_name").asc(), F.col("c_custkey").asc())
    return (
        c.select("c_custkey", "c_name")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 150) & (F.col("rn") <= 200))
    )


def q_w3_pagination_negative(spark, sf):
    """Reference parity for out-of-range pages (service.go:153-165):
    ``end = start + pageSize`` is computed BEFORE the ``start < 0``
    clamp, so any negative page leaves ``end <= start`` and the full
    unsliced sorted result set comes back — not the first page. Runs
    the real ``paginate`` operator (r5 parity fix) against an oracle
    that simply returns the whole sorted relation."""
    from walker_spark.operators.reports import paginate

    c = _t(spark, sf, "customer").select(
        F.col("c_name").alias("url"), "c_custkey"
    )
    return paginate(c, -1, 50).orderBy("url", "c_custkey")


def q_w4_top20_truncation(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_partkey") <= 200)
    return (
        li.groupBy("l_partkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.sort_array(F.collect_list("l_orderkey")), 1, 20),
                    lambda x: x.cast("string"),
                ),
            ).alias("first_orders"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("l_partkey")
    )


def q_j3_broken_links(spark, sf):
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
        .groupBy("o_orderkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.sort_array(F.collect_list("l_suppkey")), 1, 20),
                    lambda x: x.cast("string"),
                ),
            ).alias("sources"),
            F.count("l_suppkey").alias("n_sources"),
        )
        .orderBy("o_orderkey")
    )


def q_j4_reverse_links(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_suppkey") <= 50)
    return (
        li.select("l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_set("l_partkey")), lambda x: x.cast("string")
                ),
            ).alias("parts"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("l_suppkey")
    )


def q_a6_duplications(spark, sf):
    n = _t(spark, sf, "nation")
    return (
        n.groupBy(F.col("n_regionkey"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias("members"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .filter(F.col("n_members") > 1)
        .orderBy("n_regionkey")
    )


def q_a7_missing_elements(spark, sf):
    d = _t(spark, sf, "documents")
    return d.filter(F.col("n_chars") < 60).select("doc_id").orderBy("doc_id")


def q_f10_filter_chain(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view"))
        .filter((F.col("value") > 50) & (F.col("value") < 150))
        .filter(F.col("props").startswith('{"k": 1'))
        .select("event_id", "event_type", F.round("value", 2).alias("value"))
        .orderBy("event_id")
    )


def q_f12_error_classes(spark, sf):
    o = _t(spark, sf, "orders")
    cls = (
        F.when(F.col("o_totalprice") < 50_000, "low")
        .when(F.col("o_totalprice") < 150_000, "mid")
        .when(F.col("o_totalprice") < 300_000, "high")
        .otherwise("extreme")
    )
    return (
        o.withColumn("price_class", cls)
        .groupBy("price_class")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("price_class")
    )


def q_a10_redirect_maxcode(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.max("value").alias("mx"))
        .withColumn("max_bucket", F.floor(F.col("mx") / 50).cast("long"))
        .groupBy("max_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("max_bucket")
    )


def q_tpch_revenue_by_nation(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


def q_tpch_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---- training-data operators ----

def q_dedup_exact_prefix(spark, sf):
    """Exact dedup on a first-8-token signature (documents have no
    byte-identical dups at these SFs; the prefix key exercises the same
    hash-groupBy plan with non-trivial groups)."""
    d = _t(spark, sf, "documents")
    sig = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8))
    ).alias("sig")
    return (
        d.select(sig, F.col("doc_id"))
        .groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
            F.concat_ws(
                ",",
                F.transform(F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ).alias("members"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("sig")
    )


def q_dedup_jaccard_pairs(spark, sf):
    """Exact 3-gram-shingle Jaccard near-dup pairs (the oracle-checkable
    exact path; MinHash-LSH below is the scale path, rows-only)."""
    from walker_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(d, threshold=0.35).orderBy("id_a", "id_b")


def q_dedup_minhash_lsh(spark, sf):
    from walker_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf, "documents")
    return minhash_lsh_pairs(d, jaccard_threshold=0.35, bands=32, num_hashes=128).orderBy(
        "id_a", "id_b"
    )


def q_dedup_simhash(spark, sf):
    """SimHash near-dup pairs, hamming ≤ 8, on the PRODUCTION path: the
    default ``max_bucket=200`` skew cap stays ON, and the DuckDB oracle
    replicates the cap itself — the same 9-segment banding plus
    ``row_number() OVER (band, bucket ORDER BY id) <= 200`` in SQL
    (mirroring dedup.py's capped window exactly) — so the hash match
    verifies the deployed plan, not a lossless variant the entry never
    ships (VERDICT r4 #3; the r3 lossless-vs-capped delta itself is
    pinned by test_simhash_bucket_cap_semantics). The md5-prefix
    token-hash family is shared with DuckDB, so the oracle recomputes
    the exact signature in SQL."""
    from walker_spark.operators.dedup import simhash_pairs

    d = _t(spark, sf, "documents")
    return simhash_pairs(d, max_hamming=8).orderBy("id_a", "id_b")


def q_dedup_cluster_assign(spark, sf):
    """Connected components over the minhash near-dup pair set (r4) —
    the cluster-assignment step a dedup pipeline runs after pair
    generation. Spark side: distributed label propagation to fixpoint
    (operators/dedup.py::connected_components); oracle: recursive-CTE
    closure computing min-reachable-id over the exact-jaccard edge set,
    plus per-cluster sizes."""
    from pyspark.sql import Window

    from walker_spark.operators.dedup import connected_components, minhash_lsh_pairs

    d = _t(spark, sf, "documents")
    pairs = minhash_lsh_pairs(d, jaccard_threshold=0.35, bands=32, num_hashes=128)
    comp = connected_components(pairs)
    w = Window.partitionBy("component")
    return (
        comp.withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
        .orderBy("id")
    )


def q_text_token_counts(spark, sf):
    from walker_spark.functions.text import token_count_expr

    d = _t(spark, sf, "documents")
    return (
        d.withColumn("n_tokens", token_count_expr(F.col("text")).cast("long"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def q_text_bpe_tokens(spark, sf):
    from walker_spark.functions.text import token_count_expr

    d = _t(spark, sf, "documents")
    return (
        d.withColumn("n_bpe", token_count_expr(F.col("text"), mode="bpe").cast("long"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
        )
        .orderBy("lang")
    )


def q_text_quality(spark, sf):
    from walker_spark.functions.text import quality_metrics

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return quality_metrics(d, "text", "lang").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "punct_ratio",
        "digit_ratio",
    ).orderBy("doc_id")


def q_text_langid(spark, sf):
    from walker_spark.functions.text import language_id_udf

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id", language_id_udf()(F.col("text")).alias("pred_lang")
    ).orderBy("doc_id")


def q_text_fingerprint(spark, sf):
    from walker_spark.functions.text import fingerprint_expr

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id", fingerprint_expr(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def q_multimodal_decode(spark, sf):
    """Real stdlib media decode (PNG chunk-walk + zlib inflate +
    unfilter; WAV via the wave module) over deterministically
    synthesized blobs: even doc_ids get a PNG whose dims derive from the
    id, odd ids an 8 kHz WAV whose duration derives from the id. The
    oracle recomputes the expected (width, height, duration_ms) from the
    same id arithmetic — so a hash match proves the decoders really
    extracted the values from the bytes."""
    from walker_spark.operators.multimodal import decode_and_featurize, synth_media_df

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 64)
    media = synth_media_df(d)
    return (
        decode_and_featurize(media, decoder="real")
        .select("media_id", "kind", "ok", "width", "height", "duration_ms")
        .orderBy("media_id")
    )


def q_multimodal_resize(spark, sf):
    """Distributed nearest-neighbor image resize (r4): decode real PNG
    bytes → pixel array → 8×6 resize → channel-0 pixel sum + corner
    pixels. The floor mapping ``src = (dst*src_dim)//dst_dim`` plus the
    fixture's deterministic pixel arithmetic make every output scalar
    recomputable in SQL — a hash match proves pixels were decoded,
    indexed, and summed for real. PNG and GIF legs (both lossless, two
    DIFFERENT pixel formulas — RGB-interleaved vs grayscale palette —
    so the oracle distinguishes the decoders); JPEG is lossy, so its
    pixels aren't SQL-derivable and that path is pytest-covered."""
    from walker_spark.operators.multimodal import resize_images, synth_media_df

    d = _t(spark, sf, "documents").filter(
        (F.col("doc_id") < 64) & (F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 8 != 0)
    )
    media = synth_media_df(d)
    return resize_images(media, out_w=8, out_h=6, method="nearest").select(
        "media_id", "ok", "out_w", "out_h", "pix_sum", "px_first", "px_last"
    ).orderBy("media_id")


def q_multimodal_frame_sample(spark, sf):
    """Video frame sampling (r4): deterministic AVI-MJPEG containers
    (a REAL RIFF container whose frames the baseline-JPEG decoder
    decodes), sample every 2nd frame, decode it, emit decoded dims +
    container frame count/duration. The oracle recomputes the sampled
    frame indices and all metadata from the id arithmetic — matching
    width/height prove the sampled frames were really entropy-decoded,
    not counted."""
    from walker_spark.operators.multimodal import sample_video_frames, synth_video_df

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 48)
    vids = synth_video_df(d)
    return sample_video_frames(vids, every_k=2).select(
        "media_id", "frame_idx", "ok", "width", "height", "n_frames", "duration_ms"
    ).orderBy("media_id", "frame_idx")


def q_multimodal_resample(spark, sf):
    """Audio resample (r4): real WAV fixtures decimated 8 kHz → 2 kHz
    through the distributed resample op; output length and duration are
    pure functions of the fixture arithmetic, so the oracle recomputes
    them (n = 800 + 40*(id%50) samples → n/4 at 2 kHz). The decimated
    SAMPLES are pinned by pytest via integer RMS (sine values aren't
    SQL-recomputable bit-exactly, so rms stays out of the oracle
    row)."""
    from walker_spark.operators.multimodal import resample_audio, synth_media_df

    d = _t(spark, sf, "documents").filter(
        (F.col("doc_id") < 64) & (F.col("doc_id") % 2 == 1)
    )
    media = synth_media_df(d)
    return resample_audio(media, target_rate=2000).select(
        "media_id", "ok", "out_rate", "n_out", "out_duration_ms"
    ).orderBy("media_id")


def q_ann_cosine_topk(spark, sf):
    from walker_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return (
        cosine_topk(emb, q, k=10)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


def q_ann_lsh_topk(spark, sf):
    from walker_spark.operators.similarity import lsh_cosine_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return (
        lsh_cosine_topk(emb, q, k=10, bands=16, rows_per_band=6)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


def q_ann_ivf_topk(spark, sf):
    from walker_spark.operators.similarity import ivf_cosine_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return (
        ivf_cosine_topk(emb, q, k=10, n_cells=16, n_probe=6)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


def q_ann_pq_topk(spark, sf):
    """Flat Product-Quantization ADC shortlist (operators/similarity.py
    ::pq_cosine_topk): m=8 subspaces × 64-entry codebooks trained with
    ONE k-medians round (median, not mean: order-independent, so the
    quantized codebooks — and every code and score — replicate
    bit-for-bit in SQL), top-50 shortlist per query. The oracle rebuilds
    normalization, init, the median update, the encoding argmin, and
    the ADC sums relationally; recall-vs-exact is pinned separately in
    pytest (the shortlist holds ~9/10 of the exact top-10)."""
    from walker_spark.operators.similarity import pq_cosine_topk

    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return (
        pq_cosine_topk(emb, q, k=50, m=8, ks=64, train_iters=1)
        .orderBy("query_id", "rank")
    )


def _pq_sql(m: int = 8, ks: int = 64, k: int = 50, dim: int = 64) -> str:
    """PQ oracle: every stage of pq_cosine_topk rebuilt relationally.
    dsub-wide slices are 1-based inclusive in DuckDB list syntax."""
    dsub = dim // m
    return f"""
            WITH e0 AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE embedding IS NOT NULL
            ), nrm AS (
              SELECT vec_id, v,
                     sqrt(list_sum(list_transform(v, y -> y * y))) AS nv
              FROM e0
            ), n AS (
              SELECT vec_id, list_transform(v, x -> x / nv) AS u
              FROM nrm WHERE nv > 0
            ), init AS (
              SELECT vec_id, u, row_number() OVER (ORDER BY vec_id) AS ci
              FROM n ORDER BY vec_id LIMIT {ks}
            ), subs AS (
              SELECT CAST(unnest(range({m})) AS INT) AS s
            ), cb0 AS (
              SELECT subs.s, init.ci - 1 AS code,
                     init.u[subs.s * {dsub} + 1 : subs.s * {dsub} + {dsub}] AS cvec
              FROM init, subs
            ), a1 AS (
              SELECT n.vec_id, c.s, c.code,
                     row_number() OVER (
                       PARTITION BY n.vec_id, c.s
                       ORDER BY list_distance(
                         n.u[c.s * {dsub} + 1 : c.s * {dsub} + {dsub}], c.cvec),
                         c.code) AS rn
              FROM n, cb0 c
            ), asg1 AS (
              SELECT vec_id, s, code FROM a1 WHERE rn = 1
            ), dims AS (
              SELECT CAST(unnest(range(1, {dsub} + 1)) AS INT) AS i
            ), memb AS (
              SELECT a.s, a.code, d.i,
                     nn.u[a.s * {dsub} + d.i] AS val
              FROM asg1 a JOIN n nn USING (vec_id), dims d
            ), med AS (
              SELECT s, code, i, round(median(val), 9) AS mv
              FROM memb GROUP BY s, code, i
            ), cb1 AS (
              SELECT s, code, list(mv ORDER BY i) AS cvec
              FROM med GROUP BY s, code
            ), cb AS (
              SELECT c0.s, c0.code, coalesce(c1.cvec, c0.cvec) AS cvec
              FROM cb0 c0 LEFT JOIN cb1 c1 ON c1.s = c0.s AND c1.code = c0.code
            ), a2 AS (
              SELECT n.vec_id, c.s, c.code,
                     row_number() OVER (
                       PARTITION BY n.vec_id, c.s
                       ORDER BY list_distance(
                         n.u[c.s * {dsub} + 1 : c.s * {dsub} + {dsub}], c.cvec),
                         c.code) AS rn
              FROM n, cb c
            ), enc AS (
              SELECT vec_id, s, code FROM a2 WHERE rn = 1
            ), qn AS (
              SELECT vec_id, u FROM n WHERE vec_id < 5
            ), contrib AS (
              SELECT qn.vec_id AS query_id, enc.vec_id AS neighbor_id,
                     list_inner_product(
                       qn.u[enc.s * {dsub} + 1 : enc.s * {dsub} + {dsub}],
                       cb.cvec) AS part
              FROM qn, enc JOIN cb ON cb.s = enc.s AND cb.code = enc.code
              WHERE enc.vec_id <> qn.vec_id
            ), sc AS (
              SELECT query_id, neighbor_id, round(sum(part), 4) AS approx_score
              FROM contrib GROUP BY query_id, neighbor_id
            ), rk AS (
              SELECT query_id, neighbor_id, approx_score,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY approx_score DESC, neighbor_id ASC
                     ) AS INT) AS rank
              FROM sc
            )
            SELECT query_id, neighbor_id, approx_score, rank
            FROM rk WHERE rank <= {k} ORDER BY query_id, rank
    """


def q_embedding_near_dup(spark, sf):
    """Production LSH path (exact=False), NOT the O(n²) cross join —
    VERDICT r3 #1. Multi-probe banding (bands=8, rows=8, probe_bits=3)
    has recall exactly 1.0 on BOTH driver fixtures (sf0.01 AND sf0.1)
    at threshold 0.4 — pinned by tests/test_dedup_similarity.py::
    test_embedding_lsh_multiprobe_recall — so the band-join plan
    reproduces the exact-oracle answer by measurement at every SF the
    driver exercises, not merely the correctness SF (probe_bits=2
    measured 0.990 at sf0.1: same latent-failure shape ADVICE flagged
    for the simhash cap, caught by our own sf0.1 sweep)."""
    from walker_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return embedding_near_dup_pairs(
        emb, threshold=0.4, exact=False, probe_bits=3
    ).orderBy("id_a", "id_b")


def q_dedup_survivors(spark, sf):
    """End-to-end dedup pipeline (r5): minhash near-dup pairs →
    connected components → keep ONE doc per cluster (the canonical min
    id, the batch analogue of walker's first-seen URL dedup,
    scrapeloop.go:362-364) plus every singleton. Spark side prunes the
    corpus with a single left_anti join (operators/dedup.py::
    keep_one_per_cluster); the oracle recomputes survivors from the
    recursive-CTE closure over the exact-jaccard edge set."""
    from walker_spark.operators.dedup import (
        connected_components,
        keep_one_per_cluster,
        minhash_lsh_pairs,
    )

    d = _t(spark, sf, "documents")
    pairs = minhash_lsh_pairs(d, jaccard_threshold=0.35, bands=32, num_hashes=128)
    comp = connected_components(pairs)
    return (
        keep_one_per_cluster(d, comp)
        .select("doc_id", "lang", "cluster_size")
        .orderBy("doc_id")
    )


def q_text_train_filter(spark, sf):
    """C4-style corpus prefilter as a curation report: length /
    punctuation / digit / language gates per doc (functions/text.py::
    train_filter, one native-expr pass, no shuffle before the rollup),
    aggregated per lang with drop-cause attribution. The oracle
    recomputes every gate from raw text in SQL."""
    from walker_spark.functions.text import train_filter

    d = _t(spark, sf, "documents")
    t = train_filter(d, allowed_langs=("en", "de", "fr"))
    kept_l = F.col("kept").cast("long")
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept_l).alias("n_kept"),
            F.sum(
                F.when(F.col("kept"), F.col("n_tokens").cast("long")).otherwise(
                    F.lit(0)
                )
            ).alias("kept_tokens"),
            F.sum(F.col("drop_len").cast("long")).alias("drop_len"),
            F.sum(F.col("drop_punct").cast("long")).alias("drop_punct"),
            F.sum(F.col("drop_digit").cast("long")).alias("drop_digit"),
            F.sum(F.col("drop_lang").cast("long")).alias("drop_lang"),
        )
        .orderBy("lang")
    )


def q_source_quality_rollup(spark, sf):
    """Per-source (per-domain) corpus curation rollup — doc/token volume
    and average quality per origin (functions/text.py::
    corpus_quality_rollup): the view a webtext pipeline ranks domains by
    before sampling. One map-side-combined groupBy; the oracle
    recomputes token counts, ratios, and the composite quality score
    from raw text."""
    from walker_spark.functions.text import corpus_quality_rollup

    return corpus_quality_rollup(_t(spark, sf, "documents"))


def q_embedding_dedup_survivors(spark, sf):
    """Embedding-space dedup end-to-end: multi-probe LSH near-dup pairs
    (the production embedding_near_dup plan) → connected components →
    keep-one-per-cluster — the same survivor pipeline as
    dedup_survivors, composed over a different modality's pair
    generator. Oracle: exact-cosine pairs → recursive-CTE closure →
    min-id survivors."""
    from walker_spark.operators.dedup import (
        connected_components,
        keep_one_per_cluster,
    )
    from walker_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pairs = embedding_near_dup_pairs(emb, threshold=0.4, exact=False, probe_bits=3)
    comp = connected_components(pairs)
    return (
        keep_one_per_cluster(emb.select("vec_id"), comp, id_col="vec_id")
        .select("vec_id", "cluster_size")
        .orderBy("vec_id")
    )


def q_corpus_sample_stratified(spark, sf):
    """Deterministic hash-ranked stratified downsample (functions/
    text.py::stratified_sample): top-5 docs per source by md5(seed:id) —
    reproducible across runs and cluster sizes, unlike RNG sampling.
    The oracle replays the identical md5 ranking in SQL."""
    from walker_spark.functions.text import stratified_sample

    d = _t(spark, sf, "documents")
    return (
        stratified_sample(d, strata_cols=("source",), k=5, seed=42)
        .select(
            "doc_id", "source", F.col("sample_rank").cast("long").alias("sample_rank")
        )
        .orderBy("source", "sample_rank")
    )


def q_text_top_ngrams(spark, sf):
    """Corpus-wide top-20 word trigrams with occurrence counts
    (functions/text.py::top_ngrams) — the heavy-hitter / vocab pass.
    Every sliding window counts (frequency, not the dedup shingles'
    per-doc distinct); the oracle re-tokenizes and re-windows in SQL."""
    from walker_spark.functions.text import top_ngrams

    return top_ngrams(_t(spark, sf, "documents"), n=3, k=20)


def q_text_tfidf_keywords(spark, sf):
    """Per-doc top-5 TF-IDF keywords (functions/text.py::tfidf_keywords,
    smoothed sklearn idf): tokenize natively, (id, token) pairs only
    through two groupBys + one window — the text column crosses zero
    exchanges. The oracle re-derives tf, df, N, the ln-based idf, and
    the rank cut relationally; 12/6-decimal quantization makes the
    float trajectory engine-exact."""
    from walker_spark.functions.text import tfidf_keywords

    return tfidf_keywords(_t(spark, sf, "documents"), k=5).orderBy(
        "doc_id", "rank"
    )


def q_text_repetition(spark, sf):
    """Gopher-style intra-doc repetition signals (functions/text.py::
    repetition_metrics, one O(tokens) Arrow-batched counter pass): dup
    line fractions + top-2-gram / dup-3-gram character coverage. The
    documents are single-line word soup, so the fixture derives a
    line-structured text first (a newline after every token pair —
    the SAME regexp on both sides); the oracle re-derives every metric
    relationally in SQL (unnest lines / self-join n-grams)."""
    from walker_spark.functions.text import repetition_metrics

    docs = _t(spark, sf, "documents").withColumn(
        "text", F.regexp_replace("text", r"(\S+ \S+) ", "$1\n")
    )
    return (
        repetition_metrics(docs, top_ngram_n=2, dup_ngram_n=3)
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            "dup_line_char_frac",
            "top_ngram_char_frac",
            "dup_ngram_char_frac",
        )
        .orderBy("doc_id")
    )


def q_text_decontaminate(spark, sf):
    """Benchmark decontamination (functions/text.py::decontaminate):
    flag docs sharing any word 5-gram with the 'benchmark' set (every
    37th doc — an eval-set stand-in). Production path: md5-prefix gram
    hashes, broadcast bench side, ids-only groupBy; the oracle joins
    RAW gram strings (hash-free), so the match also certifies the hash
    family is collision-free on this corpus."""
    from walker_spark.functions.text import decontaminate

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    return (
        decontaminate(docs, bench, n=5)
        .select("doc_id", "n_contaminated_grams", "contaminated")
        .orderBy("doc_id")
    )


def q_text_pii_scrub(spark, sf):
    """PII detect + redact (functions/text.py::pii_scrub): emails /
    IPv4s / phone numbers counted and replaced with typed placeholders,
    sequentially per PII_PATTERNS (ipv4 scrubbed before the phone regex
    runs). The word-soup corpus has no PII, so the fixture injects
    deterministic doc_id-derived PII on both sides; scrub_hash =
    md5(scrubbed text) proves byte-identical redaction. Patterns stay
    in the Java∩RE2 dialect so DuckDB runs them verbatim."""
    from walker_spark.functions.text import pii_scrub

    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com soon"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call +1 555 01"),
                F.lpad((did % 100).cast("string"), 2, "0"),
                F.lit(" now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                ((did % 254) + 1).cast("string"),
                F.lit(" end"),
            ),
        ).otherwise(F.lit("")),
    )
    d = _t(spark, sf, "documents").withColumn("text", injected)
    return (
        pii_scrub(d)
        .select(
            "doc_id",
            "n_email",
            "n_ipv4",
            "n_phone",
            F.md5("text_scrubbed").alias("scrub_hash"),
            F.length("text_scrubbed").alias("scrub_len"),
        )
        .orderBy("doc_id")
    )


def q_host_graph(spark, sf):
    """Host-level link graph (operators/graph.py::host_graph — the
    Common Crawl host-graph artifact shape): page edges collapse to
    weighted host edges, self-loops dropped. The fixture fans each doc
    out to 2 cross-host targets via modular arithmetic (some landing
    on the SAME host — exercising the self-loop filter); the oracle
    re-derives hosts from the raw URL strings."""
    from walker_spark.operators.graph import host_graph

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    links = d.select(
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/d/"),
            did.cast("string"),
        ).alias("src_url"),
        F.explode(
            F.array(
                F.concat(
                    F.lit("http://src"), ((did * 7 + 1) % 23).cast("string"),
                    F.lit(".example.com/d/"), (did % 11).cast("string"),
                ),
                F.concat(
                    F.lit("HTTP://SRC"), ((did * 13 + 5) % 23).cast("string"),
                    F.lit(".Example.COM/d/"), (did % 5).cast("string"),
                ),
            )
        ).alias("dst_url"),
    )
    return host_graph(links).orderBy("src_host", "dst_host")


def q_host_pagerank(spark, sf):
    """Domain centrality: PageRank over the HOST graph (the host_graph
    rollup feeding operators/graph.py::pagerank — the standard
    two-stage whole-web centrality plan: collapse page edges first,
    iterate on the tiny host graph). Same quantized trajectory as
    link_pagerank; vertex set = edge-endpoint union; the oracle
    re-derives the host edge set and unrolls all 5 iterations."""
    from walker_spark.operators.graph import host_graph, pagerank

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    links = d.select(
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/d/"),
            did.cast("string"),
        ).alias("src_url"),
        F.explode(
            F.array(
                F.concat(
                    F.lit("http://src"), ((did * 7 + 1) % 23).cast("string"),
                    F.lit(".example.com/d/"), (did % 11).cast("string"),
                ),
                F.concat(
                    F.lit("HTTP://SRC"), ((did * 13 + 5) % 23).cast("string"),
                    F.lit(".Example.COM/d/"), (did % 5).cast("string"),
                ),
            )
        ).alias("dst_url"),
    )
    edges = host_graph(links).select(
        F.col("src_host").alias("s"), F.col("dst_host").alias("t")
    )
    return (
        pagerank(edges, iterations=5, damping=0.85)
        .withColumnRenamed("id", "host")
        .orderBy("host")
    )


def _host_pagerank_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled PageRank over the host-graph fixture's edge set —
    same quantization discipline as _pagerank_sql, vertex set from
    the edges, all CTEs MATERIALIZED (DuckDB re-inlines otherwise)."""
    dmp = f"{damping:.17e}"
    one_minus = f"{(1.0 - damping):.17e}"
    cte = [
        "links AS MATERIALIZED ("
        "SELECT 'http://' || source || '.example.com/d/' || doc_id AS src_url,"
        " unnest(['http://src' || ((doc_id * 7 + 1) % 23)"
        " || '.example.com/d/' || (doc_id % 11),"
        " 'HTTP://SRC' || ((doc_id * 13 + 5) % 23)"
        " || '.Example.COM/d/' || (doc_id % 5)]) AS dst_url"
        " FROM documents)",
        "edges AS MATERIALIZED (SELECT DISTINCT"
        " lower(regexp_extract(src_url,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS s,"
        " lower(regexp_extract(dst_url,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS t"
        " FROM links WHERE"
        " lower(regexp_extract(src_url,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) <>"
        " lower(regexp_extract(dst_url,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)))",
        "nodes AS MATERIALIZED (SELECT s AS id FROM edges"
        " UNION SELECT t FROM edges)",
        "deg AS MATERIALIZED (SELECT s, count(*) AS deg FROM edges GROUP BY s)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS MATERIALIZED (SELECT id,"
        " round(1e0 / (SELECT n FROM nn), 12) AS r FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        cte.append(
            f"c{k} AS MATERIALIZED (SELECT e.t AS id,"
            f" sum(round(r.r / deg.deg, 12)) AS cin"
            f" FROM r{p} r JOIN edges e ON e.s = r.id JOIN deg ON deg.s = e.s"
            f" GROUP BY e.t)"
        )
        cte.append(
            f"dang{k} AS MATERIALIZED (SELECT coalesce(sum(r.r), 0e0) AS dm"
            f" FROM r{p} r LEFT JOIN deg ON deg.s = r.id WHERE deg.s IS NULL)"
        )
        cte.append(
            f"r{k} AS MATERIALIZED (SELECT v.id, round("
            f"{one_minus} / (SELECT n FROM nn)"
            f" + {dmp} * round((SELECT dm FROM dang{k}), 12) / (SELECT n FROM nn)"
            f" + {dmp} * coalesce(c.cin, 0e0), 12) AS r"
            f" FROM r0 v LEFT JOIN c{k} c USING (id))"
        )
    return (
        "WITH "
        + ",\n ".join(cte)
        + f"\n SELECT id AS host, round(r, 6) AS rank FROM r{iters} ORDER BY host"
    )


def q_event_sessions(spark, sf):
    """Gap-based sessionization of the events log (operators/
    sessions.py::session_stats, 6-hour gap — the fixture's median
    inter-event gap is ~7.3 h, so sessions genuinely split AND
    accumulate). Integer-millisecond time arithmetic both sides
    (unix_millis vs epoch_ms); one user-keyed exchange feeds lag,
    running sum, and the rollup."""
    from walker_spark.operators.sessions import session_stats

    return session_stats(
        _t(spark, sf, "events"), gap_minutes=360
    ).orderBy("user_id", "session_seq")


def q_host_registered_domains(spark, sf):
    """eTLD+1 with real Public Suffix List semantics (functions/
    hosts.py::registered_domains): longest-rule / wildcard (*.ck) /
    exception (!www.ck) / implicit-* fallback, all exercised by the
    doc_id%8 host fixture. The oracle re-implements the PSL winner
    pick relationally (suffix explode → rule join → exc/eff/key
    ranking) — an independent second implementation of the spec."""
    from walker_spark.functions.hosts import registered_domains

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    host = (
        F.when(did % 8 == 0, F.concat(F.lit("www."), F.col("source"), F.lit(".co.uk")))
        .when(did % 8 == 1, F.concat(F.col("source"), F.lit(".com")))
        .when(did % 8 == 2, F.concat(F.lit("a.b."), F.col("source"), F.lit(".github.io")))
        .when(did % 8 == 3, F.concat(F.lit("x."), F.col("source"), F.lit(".ck")))
        .when(did % 8 == 4, F.lit("www.ck"))
        .when(did % 8 == 5, F.concat(F.lit("deep.sub."), F.col("source"), F.lit(".com.au")))
        .when(did % 8 == 6, F.col("source"))
        .otherwise(F.concat(F.lit("blog."), F.col("source"), F.lit(".blogspot.com")))
    )
    return (
        registered_domains(d.select("doc_id", host.alias("host")))
        .select("doc_id", "host", "public_suffix", "registered_domain")
        .orderBy("doc_id")
    )


def q_embedding_pca(spark, sf):
    """Top principal component by distributed power iteration
    (operators/decomp.py::power_iteration_pc1, 3 rounds): every
    cross-row/cross-dim sum is integer on a scaled grid, sqrt is the
    only transcendental (correctly rounded ⇒ bit-identical), so the
    oracle replays the ENTIRE iterative trajectory relationally —
    per-vector projections and the eigenvalue estimate must match to
    the last bit."""
    from walker_spark.operators.decomp import power_iteration_pc1

    return power_iteration_pc1(
        _t(spark, sf, "embeddings"), iterations=3
    ).orderBy("vec_id")


def q_embedding_quantize(spark, sf):
    """Symmetric int8 embedding quantization (operators/similarity.py::
    quantize_embeddings): per-vector scale, half-away int8 codes, and
    an order-free max reconstruction error — no float sums anywhere,
    so the only cross-engine discipline needed is the float32→double
    cast before arithmetic. The oracle replays the element math with
    DuckDB list lambdas."""
    from walker_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf, "embeddings")).orderBy("vec_id")


def q_corpus_split(spark, sf):
    """Deterministic hash-bucket train/val/test split (pipeline.py::
    split_corpus): bucket = int(md5('split-v1:'||id)[:8]) mod 100,
    ranges in sorted-name order (test [0,1), train [1,99),
    val [99,100)). A pure projection — stable under repartitioning
    and across engines; the oracle replays the same md5 arithmetic
    via DuckDB's 0x-hex cast."""
    from walker_spark.pipeline import split_corpus

    return (
        split_corpus(_t(spark, sf, "documents"))
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")
    )


def q_frontier_priorities(spark, sf):
    """The composed scheduler key (operators/frontier.py::
    frontier_priorities): host-prior × harmonic depth decay, trap
    exclusion via the SAME url_trap_templates relation the traps
    oracle pins — fully integer after one quantization. Host ranks are
    a deterministic host-length-derived stand-in (the production input
    is host_pagerank output); the oracle recomposes template, trap
    counts, rank, and the div arithmetic end to end."""
    from walker_spark.operators.frontier import (
        frontier_priorities,
        url_host_expr,
        url_trap_templates,
    )

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("http://"),
        F.col("source"),
        F.lit(".example.com"),
        F.when(did % 13 == 0, F.lit("/about")).otherwise(
            F.when(
                did % 3 == 0,
                F.concat(F.lit("/item/"), (did % 7).cast("string"), F.lit("/view")),
            ).otherwise(F.concat(F.lit("/page/"), did.cast("string")))
        ),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("?session="), did.cast("string"), F.lit("&lang=en")),
        ).otherwise(F.lit("")),
    )
    frontier = d.select(
        "doc_id", url.alias("url"), (did % 4).cast("long").alias("depth")
    )
    traps = url_trap_templates(frontier.select("url"), trap_threshold=10)
    ranks = (
        frontier.select(url_host_expr(F.col("url")).alias("host"))
        .distinct()
        .select(
            "host",
            F.round((F.length("host") % 7 + 1) / 10.0, 6).alias("rank"),
        )
    )
    return (
        frontier_priorities(frontier, host_ranks=ranks, trap_templates=traps)
        .select("doc_id", "url", "host", "depth", "is_trap", "priority")
        .orderBy("doc_id")
    )


def q_quality_percentile_cut(spark, sf):
    """Corpus-adaptive quality gate (functions/text.py::
    percentile_cut): cut at the exact interpolated p25 of the
    whitespace token count — Spark's percentile() vs DuckDB's
    quantile_cont(), the same cross-engine pair a12_quantiles already
    pins; strict > drops threshold ties on both sides."""
    from walker_spark.functions.text import percentile_cut

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
        ).cast("long").alias("n_tokens"),
    )
    return percentile_cut(d, "n_tokens", q=0.25).orderBy("doc_id")


def q_text_scripts(spark, sf):
    """Unicode-script triage (functions/text.py::script_metrics): the
    ASCII word-soup gets a doc_id-keyed multilingual suffix (Cyrillic /
    Han / Arabic / Greek / none) injected identically on both sides;
    Spark counts with Java \\p{IsX} script properties, the oracle with
    RE2 \\p{X} — two independent spellings of the same Unicode Script
    property must agree on every count, argmax, and 4-dec fraction."""
    from walker_spark.functions.text import script_metrics

    did = F.col("doc_id")
    # multilingual arms keep only a 5-char latin stub, so the injected
    # script WINS the argmax there (real teeth) while %5==0 docs stay
    # pure latin and mixed stubs exercise the tie-break/frac math
    injected = F.when(
        did % 5 == 1, F.concat(F.substring("text", 1, 5), F.lit(" привет мир"))
    ).when(
        did % 5 == 2, F.concat(F.substring("text", 1, 5), F.lit(" 漢字文檔 支持"))
    ).when(
        did % 5 == 3, F.concat(F.substring("text", 1, 5), F.lit(" مرحبا بالعالم"))
    ).when(
        did % 5 == 4, F.concat(F.substring("text", 1, 5), F.lit(" γειά σου κόσμε"))
    ).otherwise(F.col("text"))
    d = _t(spark, sf, "documents").withColumn("text", injected)
    return script_metrics(d).select(
        "doc_id",
        "n_arabic",
        "n_cyrillic",
        "n_greek",
        "n_han",
        "n_latin",
        "n_scripted",
        "dominant_script",
        "dominant_frac",
    ).orderBy("doc_id")


def q_frontier_budget(spark, sf):
    """Largest-remainder host budget apportionment (operators/
    frontier.py::allocate_host_budget): 997 global fetch slots split
    proportionally to per-source demand (sum of n_chars — naturally
    uneven), leftover slots to the largest integer remainders. All
    BIGINT arithmetic — the oracle replays base/remainder/winner-rank
    exactly; a prime budget forces remainders to bind."""
    from walker_spark.operators.frontier import allocate_host_budget

    demand = (
        _t(spark, sf, "documents")
        .groupBy(F.col("source").alias("host"))
        .agg(F.sum("n_chars").alias("demand"))
    )
    return allocate_host_budget(demand, total_budget=997).orderBy("host")


def q_frontier_traps(spark, sf):
    """Crawler-trap template detection (operators/frontier.py::
    url_trap_templates): digit runs in the path fold to N, query
    values drop to sorted param NAMES; per (host, template) distinct
    URLs + deterministic example + is_trap at threshold 10. The
    fixture mixes an unbounded '/page/N' generator (trap), a bounded
    '/item/N/view' family, a rare static '/about', and alternating
    session-param queries."""
    from walker_spark.operators.frontier import url_trap_templates

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("http://"),
        F.col("source"),
        F.lit(".example.com"),
        F.when(did % 13 == 0, F.lit("/about")).otherwise(
            F.when(
                did % 3 == 0,
                F.concat(F.lit("/item/"), (did % 7).cast("string"), F.lit("/view")),
            ).otherwise(F.concat(F.lit("/page/"), did.cast("string")))
        ),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("?session="), did.cast("string"), F.lit("&lang=en")),
        ).otherwise(F.lit("")),
    )
    return url_trap_templates(
        d.select(url.alias("url")), trap_threshold=10
    ).orderBy("host", "template")


def q_dedup_containment(spark, sf):
    """Asymmetric n-gram containment (operators/dedup.py::
    containment_pairs, Broder 1997): the fixture unions each document
    with a 12-token excerpt of itself (id + 10^7) — a quote/partial
    copy that Jaccard under-scores but containment pins at 1.0.
    Production joins md5-prefix gram hashes ids-only; the oracle joins
    RAW 8-gram strings (collision-freedom certificate, the repo
    pattern)."""
    from walker_spark.operators.dedup import containment_pairs

    d = _t(spark, sf, "documents").select("doc_id", "text")
    excerpts = d.select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("text"),
    )
    return containment_pairs(
        d.unionByName(excerpts), n=8, threshold=0.9
    ).orderBy("id_a", "id_b")


def q_text_vocab_stats(spark, sf):
    """Per-source lexical diversity (functions/text.py::vocab_stats):
    type-token ratio + hapax share. The soup vocabulary has no natural
    hapaxes, so docs with doc_id%4 == 0 get a doc-unique token
    appended on both sides — real hapax teeth per source."""
    from walker_spark.functions.text import vocab_stats

    did = F.col("doc_id")
    d = _t(spark, sf, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 4 == 0,
                F.concat(F.lit(" uniq"), did.cast("string")),
            ).otherwise(F.lit("")),
        ),
    )
    return vocab_stats(d).orderBy("source")


def q_text_winnow(spark, sf):
    """Winnowing fingerprints (functions/text.py::winnow_fingerprints,
    the MOSS construction): char 5-gram md5-prefix hashes, window-4
    minima selection (ties select both — deterministic, no
    arbitration), positional digest. The oracle replays BOTH window
    frames (backward min, forward max-of-mins) with identical partial
    boundary behavior; density should sit near the theoretical
    2/(w+1)."""
    from walker_spark.functions.text import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf, "documents"), k=5, w=4
    ).orderBy("doc_id")


def q_text_unicode_norm(spark, sf):
    """Unicode hygiene (functions/text.py::normalize_unicode): NFC
    composition + C0/DEL strip + horizontal-whitespace collapse. The
    fixture plants a DECOMPOSED accent (e + U+0301), a BEL control
    char, and a double space per doc_id arm; norm_hash = md5 of the
    cleaned text proves byte-identical normalization against DuckDB's
    nfc_normalize (same Unicode tables as Python's unicodedata)."""
    from walker_spark.functions.text import normalize_unicode

    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, F.lit(" cafe\u0301 ole\u0301")).otherwise(F.lit("")),
        F.when(did % 4 == 0, F.lit(" bad\x07ctl")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("  double  spaced")).otherwise(F.lit("")),
    )
    d = _t(spark, sf, "documents").withColumn("text", injected)
    return (
        normalize_unicode(d)
        .select(
            "doc_id",
            "n_ctrl",
            "changed",
            F.md5("text_norm").alias("norm_hash"),
            F.length("text_norm").alias("norm_len"),
        )
        .orderBy("doc_id")
    )


def q_text_bigram_lm(spark, sf):
    """Stupid-Backoff word-bigram LM (functions/text.py::
    bigram_lm_metrics, Brants 2007): trained on docs with
    doc_id%3 != 0; every doc scored. Docs with doc_id%5 == 0 get an
    OOV token appended on BOTH sides so the unigram-backoff AND
    OOV-floor paths genuinely fire. Same 1e-6 BIGINT grid as the char
    LM — integer doc totals, one ln per distinct score path."""
    from walker_spark.functions.text import bigram_lm_metrics

    did = F.col("doc_id")
    d = _t(spark, sf, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" zzqx"), (did % 3).cast("string")),
            ).otherwise(F.lit("")),
        ),
    )
    train = d.filter(did % 3 != 0)
    return bigram_lm_metrics(d, train=train, alpha=0.4).orderBy("doc_id")


def q_text_line_filter(spark, sf):
    """C4-style line-level cleaning (functions/text.py::
    line_quality_filter): drop lines that are too short, lack terminal
    punctuation, are ALL CAPS, or are bullets — first matching cause
    attributes the drop. The fixture synthesizes a 6-line document
    from text substrings (per-doc variation) with one line per rule
    class plus two keepers; the oracle replays every rule in RE2."""
    from walker_spark.functions.text import line_quality_filter

    did = F.col("doc_id")
    doc = F.concat_ws(
        "\n",
        F.concat(F.substring("text", 1, 30), F.lit(".")),
        F.lit("ok"),
        F.substring("text", 31, 25),
        F.lit("NAVIGATION MENU BAR."),
        F.lit("- bullet item here."),
        F.when(did % 2 == 0, F.lit("extra valid sentence for parity.")).otherwise(
            F.lit("")
        ),
    )
    d = _t(spark, sf, "documents").withColumn("text", doc)
    return line_quality_filter(d).orderBy("doc_id")


def q_text_charlm(spark, sf):
    """Character-trigram LM quality scoring (functions/text.py::
    charlm_metrics, the CCNet perplexity-gate shape): Laplace-smoothed
    trigram model trained on docs with doc_id%3 != 0, every doc scored
    — held-out docs genuinely exercise the unseen-gram/unseen-context
    fallbacks. Per-gram NLLs ride a 1e-6 scaled-BIGINT grid (integer
    doc sums, order-independent); the oracle retrains and rescores the
    whole model relationally."""
    from walker_spark.functions.text import charlm_metrics

    d = _t(spark, sf, "documents")
    train = d.filter(F.col("doc_id") % 3 != 0)
    return charlm_metrics(d, train=train, n=3, alpha=1.0).orderBy("doc_id")


def q_search_postings(spark, sf):
    """Inverted-index posting lists (operators/search.py::
    posting_lists): per term, document frequency, collection frequency,
    and the canonical 'doc:tf doc:tf' posting string in ascending doc
    order (array_sort over structs — no window). The oracle rebuilds
    postings with an ORDER BY string_agg."""
    from walker_spark.operators.search import posting_lists

    return posting_lists(_t(spark, sf, "documents")).orderBy("token")


def q_search_bm25(spark, sf):
    """BM25 top-20 (operators/search.py::bm25_topk, Lucene idf variant)
    for a mixed-selectivity query — 'dup' is rare (df≈5% of docs, high
    idf) while 'spark'/'window' are near-stopwords, so the ranking has
    real teeth. Per-term contributions are quantized to a 1e-6 BIGINT
    grid and integer-summed (order-independent across partitionings);
    the oracle replays idf/avgdl/quantization with %.17e-style double
    literals so neither engine slips into decimal arithmetic."""
    from walker_spark.operators.search import bm25_topk

    return bm25_topk(
        _t(spark, sf, "documents"), ["dup", "spark", "window"], k=20
    )


def q_text_boilerplate(spark, sf):
    """Per-group frequent-line (boilerplate) removal (functions/
    text.py::remove_boilerplate, CCNet-style): a line appearing in
    ≥40% of a source's documents is stripped. The single-line word
    soup gets the standard newline-injecting fixture regex on BOTH
    sides; production counts distinct-doc presence on md5(line) and
    never shuffles raw line text in the stats branch, while the oracle
    counts RAW lines — a value match also certifies the md5 line keys
    are collision-free on this corpus. The word-pair lines top out at
    ~24% presence (genuine negatives), so the fixture also injects a
    per-source nav header into 2/3 of docs and a footer into 1/2 —
    both above the 40% bar, both stripped. The threshold comparison is
    integer (n_with*10000 >= 4000*n_docs), engine-exact."""
    from walker_spark.functions.text import remove_boilerplate

    did = F.col("doc_id")
    docs = _t(spark, sf, "documents").withColumn(
        "text",
        F.concat(
            F.when(
                did % 3 != 0,
                F.concat(F.lit("nav menu "), F.col("source"), F.lit("\n")),
            ).otherwise(F.lit("")),
            F.regexp_replace("text", r"(\S+ \S+) ", "$1\n"),
            F.when(
                did % 2 == 0,
                F.concat(F.lit("\nfooter "), F.col("source"), F.lit(" legal")),
            ).otherwise(F.lit("")),
        ),
    )
    return remove_boilerplate(
        docs, group_col="source", min_docs=2, doc_frac=0.4
    ).orderBy("doc_id")


def q_text_span_dedup(spark, sf):
    """Cross-document duplicated-span statistics (functions/text.py::
    cross_doc_span_stats) — the gram-granular rendering of substring
    train-data dedup (Lee et al. 2021): per doc, the fraction of 8-gram
    positions (and of tokens, by exact interval union) covered by grams
    occurring in ≥2 distinct documents. Spark joins on md5-prefix gram
    hashes; the oracle joins the RAW gram text, so a hash match also
    certifies the hash family collision-free on this corpus (the same
    proof shape as text_decontaminate)."""
    from walker_spark.functions.text import cross_doc_span_stats

    return (
        cross_doc_span_stats(_t(spark, sf, "documents"), n=8, min_docs=2)
        .orderBy("doc_id")
    )


def q_text_pack_sequences(spark, sf):
    """GPT-style sequence packing (functions/text.py::pack_sequences,
    mode='concat'): md5-sharded corpus, per-shard exclusive running
    token sum, docs mapped to fixed-512-token training bins (a doc may
    span bins). Pure window arithmetic — the oracle replays the shard
    hash, the cumsum, and the bin floor-division in SQL."""
    from walker_spark.functions.text import pack_sequences

    return (
        pack_sequences(
            _t(spark, sf, "documents"), ctx=512, n_shards=8, mode="concat"
        )
        .orderBy("doc_id")
    )


def q_text_pack_examples(spark, sf):
    """Bin materialization (functions/text.py::pack_examples): the
    packed training examples themselves — per (shard, bin), the token
    array in stream order, emitted here as md5(joined tokens) so the
    oracle's string_agg-ordered rebuild pins BYTE-exact content and
    order, not just counts."""
    from walker_spark.functions.text import pack_examples

    ex = pack_examples(
        _t(spark, sf, "documents"), ctx=512, n_shards=8
    )
    return ex.select(
        "shard",
        "bin",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("tokens"))).alias("tokens_md5"),
    ).orderBy("shard", "bin")


def q_text_mixture_resample(spark, sf):
    """Temperature-mixed (α=0.5) domain resampling (functions/text.py::
    mixture_weights + mixture_resample): per-source sqrt-scaled token
    weights → exact rational per-domain rates (one IEEE sqrt, then pure
    integer/decimal arithmetic — no float-sum ordering anywhere) →
    deterministic per-doc copy counts via the md5-threshold Bernoulli.
    The oracle recomputes the whole chain in SQL with HUGEINT exactness;
    a value-hash match proves the sampling decision replicates
    bit-for-bit on another engine."""
    from walker_spark.functions.text import (
        mixture_weights,
        mixture_resample,
        token_count_expr,
    )

    d = _t(spark, sf, "documents")
    w = mixture_weights(d, group_col="source", target_tokens=None)
    r = mixture_resample(
        d.withColumn("doc_tokens", token_count_expr(F.col("text")).cast("long")),
        w,
        group_col="source",
    )
    return r.select("doc_id", "source", "doc_tokens", "n_copies").orderBy("doc_id")


def q_wet_roundtrip(spark, sf):
    """WET (Common-Crawl-style WARC conversion) sink + source round
    trip (sources/wet.py): the documents table is exported as sharded
    ``.warc.wet.gz`` files (byte-deterministic: per-shard sort + fixed
    gzip mtime) and read back through the record parser. The result
    carries the doc id parsed from WARC-Target-URI, the Content-Length
    HEADER value, and md5(text) of the parsed payload; the oracle
    recomputes byte length + md5 from the raw table — a hash match
    proves header/payload fidelity through the full container format."""
    import shutil
    import tempfile

    from walker_spark.sources.wet import read_wet, write_wet

    out_dir = os.path.join(
        tempfile.gettempdir(),
        "walker_spark_wet_oracle_" + os.path.basename(os.path.normpath(sf)),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_wet(_t(spark, sf, "documents"), out_dir, n_files=8)
    return (
        read_wet(spark, out_dir + "/*.warc.wet.gz")
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            "content_length",
            F.md5("text").alias("text_md5"),
        )
        .orderBy("doc_id")
    )


def q_corpus_diff(spark, sf):
    """Incremental-snapshot diff (pipeline.py::corpus_diff): old/new
    corpus views derived deterministically from the documents table
    (old drops id%10==0, new drops id%7==3 and rewrites text for
    id%5==1), statuses by 128-bit content hash through one full-outer
    ids+hash join. The oracle recomputes the same set algebra."""
    from walker_spark.pipeline import corpus_diff

    d = _t(spark, sf, "documents")
    old = d.filter(F.col("doc_id") % 10 != 0)
    new = d.filter(F.col("doc_id") % 7 != 3).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 1, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new).orderBy("doc_id")


def q_text_vocab_encode(spark, sf):
    """Vocabulary build + integer encoding (functions/text.py::
    build_vocab / encode_tokens): top-k frequency-ranked tokens
    (ties lexicographic; 16 here so the cap BINDS on the fixture and the
    OOV path carries real weight), corpus re-encoded with OOV→0.
    Output pins the ID SEQUENCE byte-exactly (md5 of the joined ids,
    order restored through the shuffle) plus the OOV fraction; the
    oracle rebuilds the vocabulary and the sequences relationally."""
    from walker_spark.functions.text import build_vocab, encode_tokens

    d = _t(spark, sf, "documents")
    vocab = build_vocab(d, size=16)
    enc = encode_tokens(d, vocab)
    return enc.select(
        "doc_id",
        F.size("token_ids").cast("long").alias("n_ids"),
        "oov_frac",
        F.md5(
            F.concat_ws(" ", F.transform(F.col("token_ids"), lambda x: x.cast("string")))
        ).alias("ids_md5"),
    ).orderBy("doc_id")


def q_corpus_curate(spark, sf):
    """The one-call curation pipeline (walker_spark/pipeline.py::
    curate_corpus): C4-style prefilter → exact dedup (min-id winner
    per normalized-text md5) → deterministic per-source cap, with
    every document attributed to the stage that dropped it. The oracle
    recomposes ALL THREE stages relationally in pipeline order — the
    hash match certifies the composed semantics, including that a
    filtered doc is never charged to dedup and the cap ranks only
    earlier-stage survivors."""
    from walker_spark.pipeline import curate_corpus

    return (
        curate_corpus(_t(spark, sf, "documents"), cap_per_stratum=15)
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "drop_stage",
            "kept",
        )
        .orderBy("doc_id")
    )


def q_link_pagerank(spark, sf):
    """PageRank over the documents-derived link graph (operators/
    graph.py::pagerank; the SAME edge set as the crawl oracles'
    _CRAWL_CTE: next-3 same-source docs when doc_id%7<4). 5 damped
    iterations with a 12-decimal quantized trajectory — the oracle
    unrolls all 5 iterations relationally (every constant pinned as a
    DOUBLE literal: DuckDB parses bare decimals as DECIMAL, which
    would diverge from the IEEE math Spark does) and the 6-decimal
    rank hash match proves the distributed loop computes the exact
    reference trajectory."""
    from pyspark.sql import Window

    from walker_spark.operators.graph import pagerank

    d = _t(spark, sf, "documents")
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    base = d.select("doc_id", "source", rn.alias("rn"))
    a = (
        base.filter(F.col("doc_id") % 7 < 4)
        .select(
            "source",
            F.col("doc_id").alias("s"),
            "rn",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .select("source", "s", (F.col("rn") + F.col("k")).alias("rn_t"))
    )
    edges = a.join(
        base.select("source", F.col("rn").alias("rn_t"), F.col("doc_id").alias("t")),
        ["source", "rn_t"],
    ).select("s", "t")
    nodes = d.select(F.col("doc_id").alias("id"))
    return (
        pagerank(edges, nodes=nodes, iterations=5, damping=0.85)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def q_link_hits(spark, sf):
    """HITS hubs/authorities (operators/graph.py::hits, Kleinberg
    1999) over the SAME documents-derived edge set as link_pagerank;
    5 L1-normalized iterations. The trajectory is EXACTLY
    order-independent (per-node sums ride a 1e-12 scaled-BIGINT grid;
    each half-step ends in one int/int double division), and the
    oracle unrolls all 5 iterations with the same integer grid."""
    from pyspark.sql import Window

    from walker_spark.operators.graph import hits

    d = _t(spark, sf, "documents")
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    base = d.select("doc_id", "source", rn.alias("rn"))
    a = (
        base.filter(F.col("doc_id") % 7 < 4)
        .select(
            "source",
            F.col("doc_id").alias("s"),
            "rn",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .select("source", "s", (F.col("rn") + F.col("k")).alias("rn_t"))
    )
    edges = a.join(
        base.select("source", F.col("rn").alias("rn_t"), F.col("doc_id").alias("t")),
        ["source", "rn_t"],
    ).select("s", "t")
    nodes = d.select(F.col("doc_id").alias("id"))
    return (
        hits(edges, nodes=nodes, iterations=5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def q_recrawl_schedule(spark, sf):
    """Adaptive revisit scheduling (pipeline.py::recrawl_schedule):
    per-page Laplace-smoothed change rate over 6 observed crawl rounds
    → power-of-two revisit interval + due round, all INTEGER arithmetic
    (engine-exact by construction). The fixture synthesizes the
    (page, round, changed) history with pure modular arithmetic —
    doc_id%5 sets each page's change propensity — replicated verbatim
    in the oracle."""
    from walker_spark.pipeline import recrawl_schedule

    d = _t(spark, sf, "documents")
    hist = d.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.lit(6))).alias("round")
    ).select(
        "doc_id",
        "round",
        (
            (F.col("doc_id") * 31 + F.col("round") * 17) % 10
            < F.col("doc_id") % 5
        ).alias("changed"),
    )
    return recrawl_schedule(hist, max_interval=8).orderBy("doc_id")


def q_cdx_index(spark, sf):
    """CDX(J) capture-index rows (sources/cdx.py::cdx_records): SURT
    key (reversed lowercased host labels, default ports stripped,
    fragment dropped, query params sorted) + timestamp + md5 digest +
    byte length, globally ordered — the cc-index artifact of a crawl.
    The fixture synthesizes deliberately messy URLs (upper-case scheme/
    host, :80 / :8080 ports, unsorted query, fragments) from documents;
    the oracle rebuilds the whole SURT transform relationally."""
    from walker_spark.sources.cdx import cdx_records

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("HTTP://"),
        F.when(did % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(did % 5 == 0, F.lit(":80"))
        .when(did % 7 == 0, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Docs/"),
        did.cast("string"),
        F.when(did % 2 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit("#Frag")).otherwise(F.lit("")),
    )
    ts = F.timestamp_seconds(F.lit(1700000000).cast("long") + did * 61)
    fixture = d.select(url.alias("url"), ts.alias("warc_ts"), "text")
    return cdx_records(fixture)


def _cdx_capture_fixture(spark, sf):
    """4 capture rounds per document; the payload version cycles with
    ((doc_id*31 + round*7) % 3), so digests repeat across rounds —
    exactly the across-crawl duplicate captures the revisit policy
    exists for. URL is clean/lowercase so the oracle's SURT is a plain
    label reversal; timestamps are round-major (later rounds strictly
    later)."""
    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    caps = d.select(
        "doc_id",
        "source",
        "text",
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("round"),
    ).select(
        F.concat(
            F.lit("http://"),
            F.col("source"),
            F.lit(".example.com/d/"),
            did.cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1700000000).cast("long") + F.col("round") * 100000 + did
        ).alias("warc_ts"),
        F.concat(
            F.col("text"),
            F.lit("#v"),
            ((did * 31 + F.col("round") * 7) % 3).cast("string"),
        ).alias("text"),
    )
    from walker_spark.sources.cdx import cdx_records

    return cdx_records(caps)


def q_cdx_revisits(spark, sf):
    """WARC revisit-record assignment (sources/cdx.py::revisit_records,
    identical-payload-digest profile): per (surt, digest) the earliest
    capture stays a stored response, later ones become revisits with
    refers_to_ts + stored_length 0. One (surt,digest) window over
    index-sized rows; the oracle replays the same window in SQL."""
    from walker_spark.sources.cdx import revisit_records

    return revisit_records(_cdx_capture_fixture(spark, sf)).orderBy(
        "surt", "ts", "url"
    )


def q_cdx_revisit_stats(spark, sf):
    """Per-SURT storage ledger of the revisit policy (sources/cdx.py::
    revisit_stats): captures vs distinct payloads, revisit count, bytes
    fetched vs stored, saved_frac (shared half-up 4-dec quantizer)."""
    from walker_spark.sources.cdx import revisit_stats

    return revisit_stats(_cdx_capture_fixture(spark, sf)).orderBy("surt")


def q_cdx_retention(spark, sf):
    """Temporal capture retention (sources/cdx.py::retention_sample):
    keep the 2 newest captures per SURT plus the newest per calendar
    month. 10 capture rounds spaced 20 days span ~7 months, so both
    policies genuinely bind; CDX timestamps sort lexicographically so
    the oracle replays the same string windows."""
    from walker_spark.sources.cdx import cdx_records, retention_sample

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    caps = d.select(
        "doc_id",
        "source",
        "text",
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("round"),
    ).select(
        F.concat(
            F.lit("http://"),
            F.col("source"),
            F.lit(".example.com/d/"),
            did.cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1700000000).cast("long")
            + F.col("round") * 1728000
            + did % 7200
        ).alias("warc_ts"),
        F.col("text"),
    )
    return (
        retention_sample(cdx_records(caps), keep_last=2, monthly=True)
        .select("surt", "ts", "url", "keep", "reason")
        .orderBy("surt", "ts")
    )


def q_link_anchor_rollup(spark, sf):
    """Anchor-text aggregation per target page (operators/graph.py::
    anchor_text_rollup) — inbound-link text as a target-page signal,
    over the SAME documents-derived edge set as link_pagerank. Each
    link's anchor is derived from the TARGET doc's leading tokens
    (1 or 2 of them by source parity, so targets accumulate duplicate
    anchors from different sources); the oracle recomputes the edge
    set, the anchors, and the deterministic top-3 cut relationally."""
    from pyspark.sql import Window

    from walker_spark.operators.graph import anchor_text_rollup

    d = _t(spark, sf, "documents")
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    base = d.select("doc_id", "source", rn.alias("rn"))
    a = (
        base.filter(F.col("doc_id") % 7 < 4)
        .select(
            "source",
            F.col("doc_id").alias("s"),
            "rn",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .select("source", "s", (F.col("rn") + F.col("k")).alias("rn_t"))
    )
    edges = a.join(
        base.select("source", F.col("rn").alias("rn_t"), F.col("doc_id").alias("t")),
        ["source", "rn_t"],
    ).select("s", "t")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != F.lit(""))
    tgt = d.select(F.col("doc_id").alias("t"), toks.alias("toks"))
    links = edges.join(tgt, "t").select(
        F.col("t").alias("target_id"),
        F.when(F.col("s") % 2 == 0, F.get("toks", 0))
        .otherwise(F.concat_ws(" ", F.get("toks", 0), F.get("toks", 1)))
        .alias("anchor"),
    )
    return (
        anchor_text_rollup(links, target_col="target_id", k=3)
        .select(
            "target_id",
            F.col("n_inlinks").cast("long").alias("n_inlinks"),
            F.col("n_unique_anchors").cast("long").alias("n_unique_anchors"),
            "top_anchors",
        )
        .orderBy("target_id")
    )


def _pagerank_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled PageRank oracle: every float constant emitted as a
    %.17e DOUBLE literal so DuckDB's decimal literal typing cannot
    diverge from the IEEE doubles the Spark side uses."""
    dmp = f"{damping:.17e}"
    one_minus = f"{(1.0 - damping):.17e}"
    cte = [
        "dd AS (SELECT doc_id, source, row_number() OVER "
        "(PARTITION BY source ORDER BY doc_id) AS rn FROM documents)",
        "edges AS (SELECT a.doc_id AS s, b.doc_id AS t FROM dd a JOIN dd b "
        "ON a.source = b.source AND b.rn BETWEEN a.rn + 1 AND a.rn + 3 "
        "WHERE a.doc_id % 7 < 4)",
        "deg AS (SELECT s, count(*) AS deg FROM edges GROUP BY s)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)",
        "r0 AS (SELECT doc_id AS id, round(1e0 / (SELECT n FROM nn), 12) AS r "
        "FROM documents)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        cte.append(
            f"c{k} AS (SELECT e.t AS id, sum(round(r.r / deg.deg, 12)) AS cin "
            f"FROM r{p} r JOIN edges e ON e.s = r.id JOIN deg ON deg.s = e.s "
            f"GROUP BY e.t)"
        )
        cte.append(
            f"dang{k} AS (SELECT coalesce(sum(r.r), 0e0) AS dm FROM r{p} r "
            f"LEFT JOIN deg ON deg.s = r.id WHERE deg.s IS NULL)"
        )
        cte.append(
            f"r{k} AS (SELECT v.id, round("
            f"{one_minus} / (SELECT n FROM nn) "
            f"+ {dmp} * round((SELECT dm FROM dang{k}), 12) / (SELECT n FROM nn) "
            f"+ {dmp} * coalesce(c.cin, 0e0), 12) AS r "
            f"FROM r0 v LEFT JOIN c{k} c USING (id))"
        )
    return (
        "WITH "
        + ",\n ".join(cte)
        + f"\n SELECT id AS doc_id, round(r, 6) AS rank FROM r{iters} ORDER BY doc_id"
    )


def _psl_oracle_sql() -> str:
    """PSL winner pick re-implemented relationally: suffix explode →
    rule join (wildcards need a spare label) → (exception, effective
    labels, key) ranking → slice the suffix/registered domain out of
    the label list. Rule DATA is shared with the Spark side (it's the
    fixture); the ALGORITHM is an independent second implementation."""
    from walker_spark.functions.hosts import DEFAULT_PUBLIC_SUFFIXES

    vals = []
    for r in DEFAULT_PUBLIC_SUFFIXES:
        r = r.strip().lower()
        if r.startswith("!"):
            vals.append(f"('{r[1:]}', 0, 1)")
        elif r.startswith("*."):
            vals.append(f"('{r[2:]}', 1, 0)")
        else:
            vals.append(f"('{r}', 0, 0)")
    return r"""
        WITH hosts AS MATERIALIZED (
          SELECT doc_id,
                 CASE
                   WHEN doc_id % 8 = 0 THEN 'www.' || source || '.co.uk'
                   WHEN doc_id % 8 = 1 THEN source || '.com'
                   WHEN doc_id % 8 = 2 THEN 'a.b.' || source || '.github.io'
                   WHEN doc_id % 8 = 3 THEN 'x.' || source || '.ck'
                   WHEN doc_id % 8 = 4 THEN 'www.ck'
                   WHEN doc_id % 8 = 5 THEN 'deep.sub.' || source || '.com.au'
                   WHEN doc_id % 8 = 6 THEN source
                   ELSE 'blog.' || source || '.blogspot.com'
                 END AS host
          FROM documents
        ), rules(key, wild, exc) AS MATERIALIZED (
          VALUES __VALS__
        ), hp AS MATERIALIZED (
          SELECT DISTINCT host, len(string_split(host, '.')) AS n
          FROM hosts
        ), ex AS MATERIALIZED (
          SELECT host, n,
                 unnest(list_transform(range(1, n + 1),
                   i -> array_to_string(
                          list_slice(string_split(host, '.'),
                                     CAST(i AS INT), CAST(n AS INT)), '.')))
                   AS key,
                 unnest(list_transform(range(1, n + 1), i -> n - i + 1))
                   AS nl
          FROM hp
        ), m AS MATERIALIZED (
          SELECT e.host, e.n, e.key, e.nl, r.wild, r.exc
          FROM ex e JOIN rules r ON r.key = e.key
          WHERE r.wild = 0 OR e.n > e.nl
        ), w AS MATERIALIZED (
          SELECT *,
                 row_number() OVER (PARTITION BY host
                   ORDER BY exc DESC, (nl + wild) DESC, key DESC) AS rn
          FROM m
        ), ann AS MATERIALIZED (
          SELECT host,
                 array_to_string(list_slice(string_split(host, '.'),
                   CAST(n - (CASE WHEN exc = 1 THEN nl - 1
                                  ELSE nl + wild END) + 1 AS INT),
                   CAST(n AS INT)), '.') AS ps,
                 CASE WHEN n > (CASE WHEN exc = 1 THEN nl - 1
                                     ELSE nl + wild END)
                      THEN array_to_string(list_slice(string_split(host, '.'),
                        CAST(n - (CASE WHEN exc = 1 THEN nl - 1
                                       ELSE nl + wild END) AS INT),
                        CAST(n AS INT)), '.')
                 END AS rd
          FROM w WHERE rn = 1
        )
        SELECT h.doc_id, h.host,
               coalesce(a.ps,
                 list_extract(string_split(h.host, '.'),
                              len(string_split(h.host, '.'))))
                 AS public_suffix,
               CASE WHEN a.host IS NOT NULL THEN a.rd
                    WHEN len(string_split(h.host, '.')) > 1
                      THEN array_to_string(list_slice(
                             string_split(h.host, '.'),
                             CAST(len(string_split(h.host, '.')) - 1 AS INT),
                             CAST(len(string_split(h.host, '.')) AS INT)),
                             '.')
               END AS registered_domain
        FROM hosts h LEFT JOIN ann a USING (host)
        ORDER BY h.doc_id
    """.replace("__VALS__", ", ".join(vals))


def _pca_sql(iters: int = 3, d: int = 64) -> str:
    """Unrolled power iteration (operators/decomp.py grid discipline):
    element products sign-floor-quantized to 1e-9 then INTEGER-summed
    (order-free), cross-row contributions on the 1e-6 grid, norms from
    gridded squares through one correctly-rounded sqrt — the exact
    arithmetic the distributed loop does, per iteration, in SQL."""
    cte = [
        "dims AS MATERIALIZED (SELECT unnest(range(0, %d)) AS j)" % d,
        "xe AS MATERIALIZED (SELECT vec_id, j, "
        "CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE) AS x "
        "FROM embeddings, dims)",
        "v0 AS MATERIALIZED (SELECT j, "
        "floor(1e0/%d * 1e9 + 5e-1)/1e9 AS v FROM dims)" % d,
    ]
    for k in range(1, iters + 1):
        p = k - 1
        cte.append(
            f"sc{k} AS MATERIALIZED (SELECT e.vec_id, "
            f"SUM(CAST(sign(e.x * v.v) * floor(abs(e.x * v.v) * 1e9 + 5e-1) "
            f"AS BIGINT)) AS sq "
            f"FROM xe e JOIN v{p} v USING (j) GROUP BY e.vec_id)"
        )
        cte.append(
            f"cs{k} AS MATERIALIZED (SELECT e.j, "
            f"SUM(CAST(sign(e.x * (s.sq / 1e9)) "
            f"* floor(abs(e.x * (s.sq / 1e9)) * 1e6 + 5e-1) AS BIGINT)) AS c "
            f"FROM xe e JOIN sc{k} s USING (vec_id) GROUP BY e.j)"
        )
        cte.append(
            f"w{k} AS MATERIALIZED (SELECT j, c / 1e6 AS w FROM cs{k})"
        )
        cte.append(
            f"n{k} AS MATERIALIZED (SELECT "
            f"sqrt(SUM(CAST(floor(w * w * 1e6 + 5e-1) AS BIGINT)) / 1e6) "
            f"AS nrm FROM w{k})"
        )
        cte.append(
            f"v{k} AS MATERIALIZED (SELECT j, "
            f"sign(w) * floor(abs(w / (SELECT nrm FROM n{k})) * 1e9 + 5e-1) "
            f"/ 1e9 AS v FROM w{k})"
        )
    return (
        "WITH "
        + ",\n ".join(cte)
        + f"""
        SELECT e.vec_id,
               SUM(CAST(sign(e.x * v.v) * floor(abs(e.x * v.v) * 1e9 + 5e-1)
                   AS BIGINT)) / 1e9 AS pc1,
               floor((SELECT nrm FROM n{iters}) * 1e6 + 5e-1) / 1e6
                 AS eigenvalue
        FROM xe e JOIN v{iters} v USING (j)
        GROUP BY e.vec_id ORDER BY e.vec_id"""
    )


def _hits_sql(iters: int = 5) -> str:
    """Unrolled HITS oracle on the shared documents edge set: scores
    live on a 1e-12 grid carried as scaled BIGINTs, so every sum is
    integer-exact and each half-step is one int/int double division —
    the same arithmetic the Spark loop does, replayed relationally."""
    cte = [
        "dd AS MATERIALIZED (SELECT doc_id, source, row_number() OVER "
        "(PARTITION BY source ORDER BY doc_id) AS rn FROM documents)",
        "edges AS MATERIALIZED (SELECT a.doc_id AS s, b.doc_id AS t FROM dd a JOIN dd b "
        "ON a.source = b.source AND b.rn BETWEEN a.rn + 1 AND a.rn + 3 "
        "WHERE a.doc_id % 7 < 4)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)",
        "s0 AS MATERIALIZED (SELECT doc_id AS id, "
        "floor(1e0 / (SELECT n FROM nn) * 1e12 + 5e-1) / 1e12 AS h, "
        "floor(1e0 / (SELECT n FROM nn) * 1e12 + 5e-1) / 1e12 AS a "
        "FROM documents)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        cte.append(
            f"ar{k} AS MATERIALIZED (SELECT e.t AS id, "
            f"sum(CAST(floor(s.h * 1e12 + 5e-1) AS BIGINT)) AS x "
            f"FROM s{p} s JOIN edges e ON e.s = s.id GROUP BY e.t)"
        )
        cte.append(f"at{k} AS MATERIALIZED (SELECT sum(x) AS tot FROM ar{k})")
        cte.append(
            f"aa{k} AS MATERIALIZED (SELECT v.id, round(coalesce(ar.x, 0) "
            f"/ (SELECT tot FROM at{k}), 12) AS a "
            f"FROM s0 v LEFT JOIN ar{k} ar USING (id))"
        )
        cte.append(
            f"hr{k} AS MATERIALIZED (SELECT e.s AS id, "
            f"sum(CAST(floor(a.a * 1e12 + 5e-1) AS BIGINT)) AS x "
            f"FROM aa{k} a JOIN edges e ON e.t = a.id GROUP BY e.s)"
        )
        cte.append(f"ht{k} AS MATERIALIZED (SELECT sum(x) AS tot FROM hr{k})")
        cte.append(
            f"s{k} AS MATERIALIZED (SELECT v.id, round(coalesce(hr.x, 0) "
            f"/ (SELECT tot FROM ht{k}), 12) AS h, a.a "
            f"FROM s0 v LEFT JOIN hr{k} hr USING (id) "
            f"JOIN aa{k} a ON a.id = v.id)"
        )
    return (
        "WITH "
        + ",\n ".join(cte)
        + f"\n SELECT id AS doc_id, round(h, 6) AS hub, round(a, 6) AS authority "
        f"FROM s{iters} ORDER BY doc_id"
    )


def q_text_quality_model(spark, sf):
    """Model-based quality filter (functions/text.py::quality_logit):
    a fixed logistic layer over the native quality features — the
    classifier-filter stage of the public corpus recipes, as a pure
    whole-stage-codegen projection. The oracle recomputes every
    feature AND the model (ln + sigmoid) in SQL; outputs are rounded
    to 6 decimals so the ≤1-ulp libm differences are invisible."""
    from walker_spark.functions.text import quality_logit

    return (
        quality_logit(_t(spark, sf, "documents"), lang_col=None)
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "stopword_ratio",
            "avg_token_len",
            "model_logit",
            "model_score",
            "model_keep",
        )
        .orderBy("doc_id")
    )


def q_sitemap_roundtrip(spark, sf):
    """Sitemap sink + source round trip (sources/sitemap.py): one
    spec-conformant sitemap per source (entries sorted, gzip mtime
    fixed) plus a sitemapindex, re-read through the bounded iterparse
    parser. Output = (doc_id from <loc>, loc, lastmod, priority); the
    oracle recomputes the same fields from the raw table — a hash match
    proves XML round-trip fidelity including the 1-decimal priority."""
    import shutil
    import tempfile

    from walker_spark.sources.sitemap import read_sitemaps, write_sitemaps

    out_dir = os.path.join(
        tempfile.gettempdir(),
        "walker_spark_sitemap_oracle_" + os.path.basename(os.path.normpath(sf)),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    did = F.col("doc_id")
    d = _t(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/doc/"), did.cast("string")
        ).alias("loc"),
        F.concat(
            F.lit("2026-01-"), F.lpad(((did % 28) + 1).cast("string"), 2, "0")
        ).alias("lastmod"),
        (((did % 9) + 1) / 10.0).alias("prio"),
    )
    write_sitemaps(
        d, out_dir, loc_col="loc", group_col="source",
        lastmod_col="lastmod", priority_col="prio",
    )
    return (
        read_sitemaps(spark, out_dir + "/*")
        .filter(F.col("kind") == "url")
        .select(
            F.regexp_extract("loc", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
            "loc",
            "lastmod",
            "priority",
        )
        .orderBy("doc_id")
    )


def _doc_host_expr():
    """Deterministic per-doc hostname over the documents fixture:
    ``[cdn.]h<id%23>.<source>.example`` — multi-level so suffix rules
    have structure to match."""
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 4 == 0, F.lit("cdn.")).otherwise(F.lit("")),
        F.lit("h"),
        (did % 23).cast("string"),
        F.lit("."),
        F.col("source"),
        F.lit(".example"),
    )


def q_host_blocklist(spark, sf):
    """Domain-blocklist gate (functions/hosts.py::host_blocklist_filter,
    the C4-style URL filter): label-wise suffix semantics, longest rule
    wins. Spark explodes each host's suffixes into a broadcast join
    (corpus crosses zero exchanges); the oracle uses an INDEPENDENT
    formulation — ``host = rule OR host LIKE '%.' || rule`` — so the
    hash match proves the suffix semantics themselves, not a shared
    implementation."""
    from walker_spark.functions.hosts import host_blocklist_filter

    d = _t(spark, sf, "documents").withColumn("host", _doc_host_expr())
    rules = spark.createDataFrame(
        [("src2.example",), ("h7.src0.example",), ("cdn.h3.src1.example",)],
        "rule string",
    )
    return (
        host_blocklist_filter(d, rules)
        .select("doc_id", "host", "blocked", "matched_rule")
        .orderBy("doc_id")
    )


def q_host_stats(spark, sf):
    """Per-registered-domain rollup (functions/hosts.py::host_stats):
    docs, whitespace tokens, distinct hosts per last-2-label domain.
    Spark derives the domain by label slicing; the oracle re-derives it
    with a regex — independent constructions, same values."""
    from walker_spark.functions.hosts import host_stats

    d = _t(spark, sf, "documents").withColumn("host", _doc_host_expr())
    return host_stats(d).orderBy("registered_domain")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_status_histogram": q_crawl_status_histogram,
        "crawl_broken_links": q_crawl_broken_links,
        "crawl_reverse_links": q_crawl_reverse_links,
        "crawl_fetch_batch": q_crawl_fetch_batch,
        "crawl_link_filters": q_crawl_link_filters,
        "a1_event_histogram": q_a1_event_histogram,
        "a2_latency_buckets": q_a2_latency_buckets,
        "a3_group_counts": q_a3_group_counts,
        "a4_minmax": q_a4_minmax,
        "a12_quantiles": q_a12_quantiles,
        "w1_highscore": q_w1_highscore,
        "w3_pagination": q_w3_pagination,
        "w3_pagination_negative": q_w3_pagination_negative,
        "w4_top20_truncation": q_w4_top20_truncation,
        "j3_broken_links": q_j3_broken_links,
        "j4_reverse_links": q_j4_reverse_links,
        "a6_duplications": q_a6_duplications,
        "a7_missing_elements": q_a7_missing_elements,
        "f10_filter_chain": q_f10_filter_chain,
        "f12_error_classes": q_f12_error_classes,
        "a10_redirect_maxcode": q_a10_redirect_maxcode,
        "tpch_revenue_by_nation": q_tpch_revenue_by_nation,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "dedup_exact_prefix": q_dedup_exact_prefix,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_cluster_assign": q_dedup_cluster_assign,
        "dedup_survivors": q_dedup_survivors,
        "dedup_simhash": q_dedup_simhash,
        "text_token_counts": q_text_token_counts,
        "text_bpe_tokens": q_text_bpe_tokens,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_train_filter": q_text_train_filter,
        "source_quality_rollup": q_source_quality_rollup,
        "corpus_sample_stratified": q_corpus_sample_stratified,
        "embedding_dedup_survivors": q_embedding_dedup_survivors,
        "text_top_ngrams": q_text_top_ngrams,
        "text_tfidf_keywords": q_text_tfidf_keywords,
        "text_repetition": q_text_repetition,
        "text_decontaminate": q_text_decontaminate,
        "text_pii_scrub": q_text_pii_scrub,
        "text_boilerplate": q_text_boilerplate,
        "text_charlm": q_text_charlm,
        "text_line_filter": q_text_line_filter,
        "text_bigram_lm": q_text_bigram_lm,
        "text_unicode_norm": q_text_unicode_norm,
        "text_winnow": q_text_winnow,
        "dedup_containment": q_dedup_containment,
        "text_vocab_stats": q_text_vocab_stats,
        "host_graph": q_host_graph,
        "host_pagerank": q_host_pagerank,
        "event_sessions": q_event_sessions,
        "frontier_budget": q_frontier_budget,
        "frontier_traps": q_frontier_traps,
        "text_scripts": q_text_scripts,
        "host_registered_domains": q_host_registered_domains,
        "quality_percentile_cut": q_quality_percentile_cut,
        "frontier_priorities": q_frontier_priorities,
        "corpus_split": q_corpus_split,
        "embedding_quantize": q_embedding_quantize,
        "embedding_pca": q_embedding_pca,
        "search_postings": q_search_postings,
        "search_bm25": q_search_bm25,
        "text_span_dedup": q_text_span_dedup,
        "text_pack_sequences": q_text_pack_sequences,
        "text_pack_examples": q_text_pack_examples,
        "text_mixture_resample": q_text_mixture_resample,
        "wet_roundtrip": q_wet_roundtrip,
        "host_blocklist": q_host_blocklist,
        "host_stats": q_host_stats,
        "sitemap_roundtrip": q_sitemap_roundtrip,
        "text_quality_model": q_text_quality_model,
        "link_pagerank": q_link_pagerank,
        "link_hits": q_link_hits,
        "link_anchor_rollup": q_link_anchor_rollup,
        "cdx_index": q_cdx_index,
        "cdx_revisits": q_cdx_revisits,
        "cdx_revisit_stats": q_cdx_revisit_stats,
        "cdx_retention": q_cdx_retention,
        "recrawl_schedule": q_recrawl_schedule,
        "corpus_curate": q_corpus_curate,
        "text_vocab_encode": q_text_vocab_encode,
        "corpus_diff": q_corpus_diff,
        "text_fingerprint": q_text_fingerprint,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "multimodal_resample": q_multimodal_resample,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "embedding_near_dup": q_embedding_near_dup,
    }


# shared recursive CTE modeling the documents-derived crawl graph:
# edges = next-3 same-source docs (only when doc_id % 7 < 4); seeds =
# min doc per source; ends = chain-end docs (they link to a /dead/ URL).
_CRAWL_CTE = """
            WITH RECURSIVE d AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
                     count(*) OVER (PARTITION BY source) AS n_src
              FROM documents
            ),
            edges AS (
              SELECT a.doc_id AS s, b.doc_id AS t
              FROM d a JOIN d b
                ON a.source = b.source
               AND b.rn BETWEEN a.rn + 1 AND a.rn + 3
              WHERE a.doc_id % 7 < 4
            ),
            seeds AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY source),
            reach AS (
              SELECT doc_id FROM seeds
              UNION
              SELECT e.t FROM reach r JOIN edges e ON e.s = r.doc_id
            ),
            ends AS (SELECT doc_id FROM d WHERE doc_id % 11 = 0)
"""

_NORM_TEXT_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', ' ', 'g'), "
    "'\\s+', ' ', 'g'))"
)

# shared pair CTE: the exact jaccard pair set at the minhash entry's
# threshold — used by the dedup_minhash_lsh oracle AND as the edge set
# of the dedup_cluster_assign components oracle. Short docs (<3 tokens)
# get one whole-text shingle, mirroring shingle_expr's fallback window.
_MINHASH_PAIR_CTES = f"""norm AS (
              SELECT doc_id, {_NORM_TEXT_SQL} AS t FROM documents
            ),
            toks AS (
              SELECT doc_id,
                     unnest(string_split(t, ' ')) AS tok,
                     generate_subscripts(string_split(t, ' '), 1) AS pos
              FROM norm
            ),
            sh AS (
              SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
              FROM toks a
              JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              UNION
              SELECT doc_id, t AS s FROM norm
              WHERE len(string_split(t, ' ')) < 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            ),
            mh_pairs AS (
              SELECT id_a, id_b,
                     round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.35
            )"""




def _langid_sql() -> str:
    """DuckDB replica of functions/text.py language_id_udf: lowercase,
    CJK block share on the first 400 chars, else per-language trigram
    occurrence scores over the first 1000 chars; strictly-greater update
    order en→de→fr→es→it means earlier languages win ties; best < 2 →
    unk. Occurrence counting is non-overlapping on both sides
    (str.count vs replace-delta)."""
    from walker_spark.functions.text import _PROFILES

    def count_expr(g: str) -> str:
        e = g.replace("'", "''")
        return f"(length(s1000) - length(replace(s1000, '{e}', ''))) / {len(g)}"

    score_cols = ",\n                 ".join(
        f"({' + '.join(count_expr(g) for g in grams)}) AS s_{lang}"
        for lang, grams in _PROFILES.items()
    )
    langs = list(_PROFILES)
    branches = []
    for i, lang in enumerate(langs):
        later = langs[i + 1 :]
        conds = [f"s_{lang} >= 2"] + [f"s_{lang} >= s_{o}" for o in later]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "\n                 ".join(branches)
    return f"""
        WITH t AS (
          SELECT doc_id, lower(coalesce(text, '')) AS t
          FROM documents WHERE doc_id < 200
        ), s AS (
          SELECT doc_id, t, substr(t, 1, 400) AS s400, substr(t, 1, 1000) AS s1000
          FROM t
        ), sc AS (
          SELECT doc_id, t,
                 length(regexp_replace(s400, '[^一-鿿]', '', 'g')) AS n_cjk,
                 length(s400) AS n400,
                 {score_cols}
          FROM s
        )
        SELECT doc_id,
          CASE WHEN t = '' THEN 'unk'
               WHEN n_cjk > n400 * 0.2 THEN 'zh'
               {case}
               ELSE 'unk' END AS pred_lang
        FROM sc ORDER BY doc_id
    """


def _ann_ivf_sql() -> str:
    """DuckDB replica of operators/similarity.ivf_cosine_topk with the
    Lloyd iterations unrolled as CTEs (init = first 16 vectors by id;
    3 iterations of assign-argmax-cosine / per-dim mean, empty cells
    keeping their previous centroid; ties to the lowest cell index —
    Spark's array_position-of-array_max). Float caveat: Spark's avg and
    DuckDB's avg may differ in the last ulp; an assignment flip would
    need two cell cosines within ~1e-15, which the synthetic embeddings
    never produce."""
    n_cells, n_probe, iters, k = 16, 6, 3, 10
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v "
        f"FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_cells}))",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts += [
            f"a{i} AS (SELECT vec_id, cell FROM ("
            f"  SELECT e.vec_id, {prev}.cell, row_number() OVER ("
            f"    PARTITION BY e.vec_id"
            f"    ORDER BY list_cosine_similarity(e.v, {prev}.v) DESC, {prev}.cell ASC"
            f"  ) AS r FROM e CROSS JOIN {prev}) WHERE r = 1)",
            f"x{i} AS (SELECT a.cell, generate_subscripts(e.v, 1) AS idx, unnest(e.v) AS val "
            f"FROM a{i} a JOIN e USING (vec_id))",
            f"m{i} AS (SELECT cell, list(mx ORDER BY idx) AS v FROM ("
            f"  SELECT cell, idx, avg(val) AS mx FROM x{i} GROUP BY cell, idx) GROUP BY cell)",
            f"c{i} AS (SELECT {prev}.cell, COALESCE(m.v, {prev}.v) AS v "
            f"FROM {prev} LEFT JOIN m{i} m USING (cell))",
        ]
        prev = f"c{i}"
    parts += [
        f"cells AS (SELECT vec_id, cell FROM ("
        f"  SELECT e.vec_id, {prev}.cell, row_number() OVER ("
        f"    PARTITION BY e.vec_id"
        f"    ORDER BY list_cosine_similarity(e.v, {prev}.v) DESC, {prev}.cell ASC"
        f"  ) AS r FROM e CROSS JOIN {prev}) WHERE r = 1)",
        f"probes AS (SELECT query_id, cell FROM ("
        f"  SELECT q.vec_id AS query_id, {prev}.cell, row_number() OVER ("
        f"    PARTITION BY q.vec_id"
        f"    ORDER BY list_cosine_similarity(q.v, {prev}.v) DESC, {prev}.cell ASC"
        f"  ) AS r FROM e q CROSS JOIN {prev} WHERE q.vec_id < 5) WHERE r <= {n_probe})",
        "cand AS (SELECT p.query_id, s.vec_id AS neighbor_id "
        "FROM probes p JOIN cells s USING (cell) WHERE s.vec_id <> p.query_id)",
        "scored AS (SELECT cand.query_id, cand.neighbor_id, "
        "round(round(list_cosine_similarity(qe.v, ce.v), 6), 4) AS cos, "
        "row_number() OVER (PARTITION BY cand.query_id "
        "ORDER BY round(list_cosine_similarity(qe.v, ce.v), 6) DESC, cand.neighbor_id ASC) AS rank "
        "FROM cand JOIN e qe ON qe.vec_id = cand.query_id "
        "JOIN e ce ON ce.vec_id = cand.neighbor_id)",
    ]
    ctes = ",\n        ".join(parts)
    return (
        f"WITH {ctes}\n"
        f"SELECT query_id, neighbor_id, cos, rank FROM scored "
        f"WHERE rank <= {k} ORDER BY query_id, rank"
    )


def _ann_lsh_sql() -> str:
    """DuckDB replica of operators/similarity.lsh_cosine_topk with the
    seed-42 hyperplanes embedded as literals (bands=16, rows_per_band=6,
    dim=64 — the embeddings tables' dimension at every SF): candidates =
    pairs sharing ≥1 sign-bit band, exact cosine re-rank. The plane set
    is pure numpy (independent of Spark), so the oracle is a genuinely
    independent computation."""
    from walker_spark.operators.similarity import _hyperplanes

    bands, rows, dim = 16, 6, 64
    planes = _hyperplanes(dim, bands * rows, seed=42)
    values = ",\n              ".join(
        f"({b * rows + i}, {b}, {i}, [{', '.join(repr(x) for x in planes[b * rows + i])}]::DOUBLE[])"
        for b in range(bands)
        for i in range(rows)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        planes(pid, band, i, p) AS (VALUES
              {values}
        ),
        proj AS (
          SELECT e.vec_id, pl.band,
                 SUM(CASE WHEN list_dot_product(e.v, pl.p) > 0
                          THEN (1::BIGINT << pl.i) ELSE 0 END) AS bucket
          FROM e CROSS JOIN planes pl
          GROUP BY e.vec_id, pl.band
        ),
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM proj q JOIN proj c ON q.band = c.band AND q.bucket = c.bucket
          WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        ),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 round(round(list_cosine_similarity(qe.v, ce.v), 6), 4) AS cos,
                 row_number() OVER (
                   PARTITION BY cand.query_id
                   ORDER BY round(list_cosine_similarity(qe.v, ce.v), 6) DESC,
                            cand.neighbor_id ASC
                 ) AS rank
          FROM cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ce ON ce.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, cos, rank FROM scored
        WHERE rank <= 10 ORDER BY query_id, rank
    """


def oracle_sql() -> dict[str, str]:
    return {
        "crawl_status_histogram": f"""
            {_CRAWL_CTE}
            SELECT 200 AS code, count(*) AS cnt FROM reach
            UNION ALL
            SELECT 404 AS code, count(*) AS cnt
            FROM reach JOIN ends USING (doc_id)
            HAVING count(*) > 0
            ORDER BY code
        """,
        "crawl_broken_links": f"""
            {_CRAWL_CTE}
            SELECT printf('https://%s.example/dead/%d.html', d.source, d.doc_id) AS dst_url,
                   printf('https://%s.example/d/%d.html', d.source, d.doc_id) AS sources,
                   CAST(1 AS BIGINT) AS n_sources
            FROM reach JOIN ends USING (doc_id) JOIN d USING (doc_id)
            ORDER BY dst_url
        """,
        "crawl_reverse_links": f"""
            {_CRAWL_CTE},
            ra AS (SELECT d.* FROM d JOIN reach USING (doc_id)),
            redges AS (
              SELECT printf('https://%s.example/d/%d.html', a.source, a.doc_id) AS src,
                     printf('https://%s.example/d/%d.html', b.source, b.doc_id) AS dst
              FROM ra a JOIN d b
                ON a.source = b.source AND b.rn BETWEEN a.rn + 1 AND a.rn + 3
              WHERE a.doc_id % 7 < 4
              UNION ALL
              SELECT printf('https://%s.example/d/%d.html', d.source, d.doc_id),
                     printf('https://%s.example/dead/%d.html', d.source, d.doc_id)
              FROM reach JOIN ends USING (doc_id) JOIN d USING (doc_id)
            ),
            allurls AS (
              SELECT printf('https://%s.example/d/%d.html', d.source, d.doc_id) AS url
              FROM reach JOIN d USING (doc_id)
              UNION ALL
              SELECT printf('https://%s.example/dead/%d.html', d.source, d.doc_id)
              FROM reach JOIN ends USING (doc_id) JOIN d USING (doc_id)
            )
            SELECT u.url,
                   coalesce(array_to_string(list_sort(list(DISTINCT r.src) FILTER (r.src IS NOT NULL)), ','), '') AS linked_from,
                   count(DISTINCT r.src) AS n_links
            FROM allurls u LEFT JOIN redges r ON r.dst = u.url
            GROUP BY u.url ORDER BY u.url
        """,
        # crawl_fetch_batch: the oracle is the UNSALTED per-host window —
        # the Spark side runs the two-phase salted top-k, so a hash
        # match proves the salting identity (per-host top-budget ⊆
        # union of per-salt top-budget) on a frontier where one host
        # holds ~half the rows.
        "crawl_fetch_batch": """
            WITH f AS (
              SELECT printf('https://%s/d/%d.html',
                       CASE WHEN doc_id % 2 = 0 THEN 'hot.example'
                            ELSE source || '.example' END, doc_id) AS url,
                     CASE WHEN doc_id % 2 = 0 THEN 'hot.example'
                          ELSE source || '.example' END AS host,
                     CAST(doc_id % 3 AS BIGINT) AS depth,
                     CAST((doc_id % 7) * 3 AS BIGINT) AS link_count
              FROM documents
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY host
                ORDER BY depth ASC, link_count DESC, url ASC
              ) AS rn FROM f
            )
            SELECT url, host, depth, link_count FROM r
            WHERE rn <= 16 ORDER BY url
        """,
        # crawl_link_filters: full SQL replica of F1-F9 — normalization
        # (fragment strip + base scheme/host resolution), pager, host/
        # scheme, depth, ignore-prefix, robots (this rule set is one
        # Disallow prefix), query names, include prefixes, nofollow —
        # plus the min-depth/sum-count frontier merge. Every predicate
        # is recomputed from the raw href text, not echoed from Spark.
        "crawl_link_filters": """
            WITH d AS (
              SELECT doc_id, source || '.example' AS host,
                     CAST(doc_id % 3 AS BIGINT) AS depth
              FROM documents
              WHERE doc_id % 5 <> 0  -- F9: nofollow pages contribute nothing
            ),
            links AS (
              SELECT doc_id, host, depth,
                     unnest([
                       printf('/d/%d.html#frag', doc_id + 1),
                       printf('/d/%d.html', doc_id + 1),
                       printf('/d/%d.html', doc_id + 2),
                       printf('/d/%d.html?x=1&y=2', doc_id + 3),
                       printf('/d/%d.html?session=abc', doc_id + 2),
                       printf('https://other.example/d/%d.html', doc_id),
                       printf('http://%s/d/%d.html', host, doc_id),
                       printf('/d/a/b/c/%d.html', doc_id),
                       printf('/private/%d.html', doc_id),
                       printf('/list/%d.html', doc_id),
                       printf('/d/next/%d.html', doc_id),
                       printf('/blocked/%d.html', doc_id)
                     ]) AS raw
              FROM d
            ),
            norm AS (
              SELECT doc_id, host, depth,
                     CASE WHEN raw LIKE '%://%' THEN split_part(raw, '#', 1)
                          ELSE 'https://' || host || split_part(raw, '#', 1)
                     END AS link
              FROM links
            ),
            parts AS (
              SELECT *,
                     regexp_extract(link, '^([a-z]+)://', 1) AS lscheme,
                     regexp_extract(link, '^[a-z]+://([^/?#]*)', 1) AS lhost,
                     regexp_extract(link, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS lpath,
                     CASE WHEN link LIKE '%?%' THEN split_part(link, '?', 2)
                          ELSE '' END AS lquery
              FROM norm
            ),
            filtered AS (
              SELECT * FROM parts
              WHERE link <> printf('https://%s/d/next/%d.html', host, doc_id)
                AND lhost = host AND lscheme = 'https'
                AND len(string_split(lpath, '/')) - 1 <= 3
                AND lpath NOT LIKE '/private/%'
                AND NOT list_contains(
                      list_transform(string_split(lquery, '&'),
                                     s -> split_part(s, '=', 1)),
                      'session')
                AND (lpath LIKE '/d/%' OR lpath LIKE '/blocked/%')
                AND lpath NOT LIKE '/blocked/%'
            )
            SELECT link AS url, lhost AS host,
                   min(depth) + 1 AS depth,
                   CAST(count(*) AS BIGINT) AS link_count
            FROM filtered GROUP BY link, lhost ORDER BY url
        """,
        "a1_event_histogram": """
            SELECT event_type, count(*) AS cnt FROM events
            GROUP BY event_type ORDER BY event_type
        """,
        "a2_latency_buckets": """
            WITH ev AS (
              SELECT event_type, CAST(value * 50000 AS BIGINT) AS duration_us FROM events
            ), b AS (
              SELECT event_type,
                CASE
                  WHEN duration_us/1000.0 > 0     AND duration_us/1000.0 < 50     THEN 'awesome'
                  WHEN duration_us/1000.0 > 50    AND duration_us/1000.0 < 100    THEN 'great'
                  WHEN duration_us/1000.0 > 100   AND duration_us/1000.0 < 200    THEN 'ok, google loves you'
                  WHEN duration_us/1000.0 > 200   AND duration_us/1000.0 < 300    THEN 'not too good, but still ok'
                  WHEN duration_us/1000.0 > 300   AND duration_us/1000.0 < 500    THEN 'not great'
                  WHEN duration_us/1000.0 > 500   AND duration_us/1000.0 < 1000   THEN 'bad, users start to feel a real difference'
                  WHEN duration_us/1000.0 > 1000  AND duration_us/1000.0 < 3000   THEN 'really bad, you are loosing users'
                  WHEN duration_us/1000.0 > 3000  AND duration_us/1000.0 < 5000   THEN 'ouch this seems broken'
                  WHEN duration_us/1000.0 > 5000  AND duration_us/1000.0 < 10000  THEN 'catastrophic you site seems to be down'
                  WHEN duration_us/1000.0 > 10000 AND duration_us/1000.0 < 3600000 THEN 'end of the world - this must not happen'
                END AS bucket
              FROM ev
            )
            SELECT event_type, bucket, count(*) AS cnt,
                   round(count(*) * 100.0 / sum(count(*)) OVER (PARTITION BY event_type)) AS pct
            FROM b WHERE bucket IS NOT NULL
            GROUP BY event_type, bucket ORDER BY event_type, bucket
        """,
        "a3_group_counts": """
            SELECT o_orderpriority, count(*) AS cnt FROM orders
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "a4_minmax": """
            SELECT round(min(value), 2) AS min_value, round(max(value), 2) AS max_value
            FROM events
        """,
        "a12_quantiles": """
            SELECT round(quantile_cont(l_quantity, 0.5), 4) AS p50,
                   round(quantile_cont(l_quantity, 0.9), 4) AS p90,
                   round(quantile_cont(l_quantity, 0.99), 4) AS p99
            FROM lineitem
        """,
        "w1_highscore": """
            SELECT event_id, round(value, 2) AS value,
                   row_number() OVER (ORDER BY value ASC, event_id ASC) AS rank
            FROM events
            QUALIFY rank <= 100
        """,
        "w3_pagination_negative": """
            SELECT c_name AS url, c_custkey FROM customer
            ORDER BY url, c_custkey
        """,
        "w3_pagination": """
            SELECT c_custkey, c_name,
                   row_number() OVER (ORDER BY c_name ASC, c_custkey ASC) AS rn
            FROM customer
            QUALIFY rn > 150 AND rn <= 200
        """,
        "w4_top20_truncation": """
            SELECT l_partkey,
                   array_to_string(list_sort(list(l_orderkey))[1:20], ',') AS first_orders,
                   count(*) AS n_orders
            FROM lineitem WHERE l_partkey <= 200
            GROUP BY l_partkey ORDER BY l_partkey
        """,
        "j3_broken_links": """
            SELECT o_orderkey,
                   coalesce(array_to_string(list_sort(list(l_suppkey) FILTER (l_suppkey IS NOT NULL))[1:20], ','), '') AS sources,
                   count(l_suppkey) AS n_sources
            FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY o_orderkey ORDER BY o_orderkey
        """,
        "j4_reverse_links": """
            SELECT l_suppkey,
                   array_to_string(list_sort(list(DISTINCT l_partkey)), ',') AS parts,
                   count(DISTINCT l_partkey) AS n_parts
            FROM lineitem WHERE l_suppkey <= 50
            GROUP BY l_suppkey ORDER BY l_suppkey
        """,
        "a6_duplications": """
            SELECT n_regionkey,
                   array_to_string(list_sort(list(DISTINCT n_name)), ',') AS members,
                   count(*) AS n_members
            FROM nation GROUP BY n_regionkey
            HAVING count(*) > 1 ORDER BY n_regionkey
        """,
        "a7_missing_elements": """
            SELECT doc_id FROM documents WHERE n_chars < 60 ORDER BY doc_id
        """,
        "f10_filter_chain": """
            SELECT event_id, event_type, round(value, 2) AS value FROM events
            WHERE event_type IN ('click', 'view')
              AND value > 50 AND value < 150
              AND props LIKE '{"k": 1%'
            ORDER BY event_id
        """,
        "f12_error_classes": """
            SELECT CASE
                     WHEN o_totalprice < 50000 THEN 'low'
                     WHEN o_totalprice < 150000 THEN 'mid'
                     WHEN o_totalprice < 300000 THEN 'high'
                     ELSE 'extreme'
                   END AS price_class,
                   count(*) AS cnt
            FROM orders GROUP BY price_class ORDER BY price_class
        """,
        "a10_redirect_maxcode": """
            WITH mx AS (SELECT user_id, max(value) AS mx FROM events GROUP BY user_id)
            SELECT CAST(floor(mx / 50) AS BIGINT) AS max_bucket, count(*) AS cnt
            FROM mx GROUP BY max_bucket ORDER BY max_bucket
        """,
        "tpch_revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "dedup_exact_prefix": """
            WITH sig AS (
              SELECT md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS sig,
                     doc_id
              FROM documents
            )
            SELECT sig, count(*) AS n_dups, min(doc_id) AS keep_id,
                   array_to_string(list_sort(list(doc_id)), ',') AS members
            FROM sig GROUP BY sig HAVING count(*) > 1 ORDER BY sig
        """,
        "dedup_jaccard_pairs": f"""
            WITH norm AS (
              SELECT doc_id, {_NORM_TEXT_SQL} AS t FROM documents WHERE doc_id < 200
            ),
            toks AS (
              SELECT doc_id,
                     unnest(string_split(t, ' ')) AS tok,
                     generate_subscripts(string_split(t, ' '), 1) AS pos
              FROM norm
            ),
            sh AS (
              SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
              FROM toks a
              JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT id_a, id_b,
                   round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.35
            ORDER BY id_a, id_b
        """,
        "text_token_counts": """
            WITH t AS (
              SELECT lang,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
              FROM documents
            )
            SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(avg(n_tokens), 4) AS avg_tokens
            FROM t GROUP BY lang ORDER BY lang
        """,
        "text_quality": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                   round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0
                         / length(text), 4) AS punct_ratio,
                   round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0
                         / length(text), 4) AS digit_ratio
            FROM documents WHERE doc_id < 100 ORDER BY doc_id
        """,
        "ann_cosine_topk": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.qv, e.v), 4) AS cos,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id ASC
                     ) AS rank
              FROM q CROSS JOIN e
              WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, cos, rank FROM scored
            WHERE rank <= 10 ORDER BY query_id, rank
        """,
        "embedding_near_dup": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 4) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.4
            ORDER BY id_a, id_b
        """,
        # dedup_minhash_lsh: the oracle is the EXACT jaccard pair set
        # (_MINHASH_PAIR_CTES) — LSH with 32 bands / 128 hashes at
        # threshold 0.35 has recall 1.0 on these tables (checked at
        # sf0.001/0.01/0.1 and pinned by the lsh==exact pytest), so the
        # candidate path must reproduce the exact answer bit-for-bit.
        "dedup_minhash_lsh": f"""
            WITH {_MINHASH_PAIR_CTES}
            SELECT id_a, id_b, jaccard FROM mh_pairs ORDER BY id_a, id_b
        """,
        # dedup_cluster_assign: connected components over the SAME pair
        # set, recomputed exactly (recursive-CTE closure on the
        # undirected edge set; component = min reachable id) — checks
        # the distributed label-propagation fixpoint end-to-end.
        "dedup_cluster_assign": f"""
            WITH RECURSIVE {_MINHASH_PAIR_CTES},
            cedges AS (
              SELECT id_a AS src, id_b AS dst FROM mh_pairs
              UNION
              SELECT id_b, id_a FROM mh_pairs
            ),
            cnodes AS (SELECT DISTINCT src AS id FROM cedges),
            creach AS (
              SELECT id, id AS r FROM cnodes
              UNION
              SELECT e.dst AS id, creach.r
              FROM creach JOIN cedges e ON e.src = creach.id
            ),
            comp AS (
              SELECT id, min(r) AS component FROM creach GROUP BY id
            )
            SELECT c.id, c.component,
                   CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT)
                     AS cluster_size
            FROM comp c ORDER BY c.id
        """,
        "dedup_survivors": f"""
            WITH RECURSIVE {_MINHASH_PAIR_CTES},
            cedges AS (
              SELECT id_a AS src, id_b AS dst FROM mh_pairs
              UNION
              SELECT id_b, id_a FROM mh_pairs
            ),
            cnodes AS (SELECT DISTINCT src AS id FROM cedges),
            creach AS (
              SELECT id, id AS r FROM cnodes
              UNION
              SELECT e.dst AS id, creach.r
              FROM creach JOIN cedges e ON e.src = creach.id
            ),
            comp AS (
              SELECT id, min(r) AS component FROM creach GROUP BY id
            ),
            csizes AS (
              SELECT component, count(*) AS cluster_size
              FROM comp GROUP BY component
            )
            SELECT d.doc_id, d.lang,
                   CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size
            FROM documents d
            LEFT JOIN comp c ON c.id = d.doc_id
            LEFT JOIN csizes s ON s.component = c.id
            WHERE c.id IS NULL OR c.id = c.component
            ORDER BY d.doc_id
        """,
        "text_train_filter": """
            WITH t AS (
              SELECT lang,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS n_tokens,
                     round((length(text) - length(regexp_replace(text,
                         '[^\\w\\s]', '', 'g'))) * 1.0 / length(text), 4)
                       AS punct_ratio,
                     round((length(text) - length(regexp_replace(text,
                         '[0-9]', '', 'g'))) * 1.0 / length(text), 4)
                       AS digit_ratio
              FROM documents
            ), g AS (
              SELECT lang, n_tokens,
                     (n_tokens < 5 OR n_tokens > 100000) AS drop_len,
                     punct_ratio > 0.2 AS drop_punct,
                     digit_ratio > 0.3 AS drop_digit,
                     lang NOT IN ('en', 'de', 'fr') AS drop_lang
              FROM t
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(CASE WHEN NOT (drop_len OR drop_punct OR drop_digit
                                           OR drop_lang)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(sum(CASE WHEN NOT (drop_len OR drop_punct OR drop_digit
                                           OR drop_lang)
                                 THEN n_tokens ELSE 0 END) AS BIGINT)
                     AS kept_tokens,
                   CAST(sum(CASE WHEN drop_len THEN 1 ELSE 0 END) AS BIGINT)
                     AS drop_len,
                   CAST(sum(CASE WHEN drop_punct THEN 1 ELSE 0 END) AS BIGINT)
                     AS drop_punct,
                   CAST(sum(CASE WHEN drop_digit THEN 1 ELSE 0 END) AS BIGINT)
                     AS drop_digit,
                   CAST(sum(CASE WHEN drop_lang THEN 1 ELSE 0 END) AS BIGINT)
                     AS drop_lang
            FROM g GROUP BY lang ORDER BY lang
        """,
        "source_quality_rollup": """
            WITH t AS (
              SELECT source,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS n_tokens,
                     round((length(text) - length(regexp_replace(text,
                         '[^\\w\\s]', '', 'g'))) * 1.0 / length(text), 4)
                       AS punct_ratio,
                     round((length(text) - length(regexp_replace(text,
                         '[0-9]', '', 'g'))) * 1.0 / length(text), 4)
                       AS digit_ratio
              FROM documents
            ), q AS (
              SELECT source, n_tokens, punct_ratio,
                     round((1.0 - least(punct_ratio * 2, 0.5)
                                - least(digit_ratio, 0.3))
                           * (CASE WHEN n_tokens BETWEEN 5 AND 100000
                                   THEN 1.0 ELSE 0.3 END), 4) AS quality_score
              FROM t
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(avg(n_tokens), 4) AS avg_tokens,
                   round(avg(punct_ratio), 4) AS avg_punct_ratio,
                   round(avg(quality_score), 4) AS avg_quality
            FROM q GROUP BY source ORDER BY source
        """,
        "embedding_dedup_survivors": """
            WITH RECURSIVE e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ),
            ep AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM e a JOIN e b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.v, b.v) >= 0.4
            ),
            cedges AS (
              SELECT id_a AS src, id_b AS dst FROM ep
              UNION
              SELECT id_b, id_a FROM ep
            ),
            cnodes AS (SELECT DISTINCT src AS id FROM cedges),
            creach AS (
              SELECT id, id AS r FROM cnodes
              UNION
              SELECT x.dst AS id, creach.r
              FROM creach JOIN cedges x ON x.src = creach.id
            ),
            comp AS (
              SELECT id, min(r) AS component FROM creach GROUP BY id
            ),
            csizes AS (
              SELECT component, count(*) AS cluster_size
              FROM comp GROUP BY component
            )
            SELECT em.vec_id,
                   CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size
            FROM embeddings em
            LEFT JOIN comp c ON c.id = em.vec_id
            LEFT JOIN csizes s ON s.component = c.id
            WHERE c.id IS NULL OR c.id = c.component
            ORDER BY em.vec_id
        """,
        "corpus_sample_stratified": """
            WITH r AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                     ) AS sample_rank
              FROM documents
            )
            SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
            FROM r WHERE sample_rank <= 5
            ORDER BY source, sample_rank
        """,
        "text_top_ngrams": r"""
            WITH raw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\W+')) AS tok,
                     generate_subscripts(
                       string_split_regex(lower(text), '\W+'), 1) AS pos
              FROM documents
            ), tk AS (
              SELECT doc_id, tok,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
              FROM raw WHERE tok <> ''
            ), g AS (
              SELECT a.tok || ' ' || b.tok || ' ' || c.tok AS ngram
              FROM tk a
              JOIN tk b ON b.doc_id = a.doc_id AND b.p = a.p + 1
              JOIN tk c ON c.doc_id = a.doc_id AND c.p = a.p + 2
            )
            SELECT ngram, count(*) AS n_occurrences
            FROM g GROUP BY ngram
            ORDER BY n_occurrences DESC, ngram ASC LIMIT 20
        """,
        # text_tfidf_keywords: tf/df/N and the smoothed ln idf all
        # re-derived in SQL; idf rounded to 12 decimals, score to 6,
        # rank on the rounded score — identical quantization on both
        # sides makes the ln() trajectory engine-exact.
        "text_tfidf_keywords": r"""
            WITH raw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\W+')) AS token
              FROM documents
            ), pairs AS (
              SELECT doc_id, token FROM raw WHERE token <> ''
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf
              FROM pairs GROUP BY doc_id, token
            ), docfreq AS (
              SELECT token, count(*) AS df FROM tf GROUP BY token
            ), nn AS (
              SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
            ), scored AS (
              SELECT tf.doc_id, tf.token, tf.tf,
                     round(tf.tf * round(
                       ln(((SELECT n FROM nn) + 1e0) / (docfreq.df + 1e0))
                       + 1e0, 12), 6) AS score
              FROM tf JOIN docfreq USING (token)
            ), ranked AS (
              SELECT doc_id, token, tf, score,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, token ASC) AS rank
              FROM scored
            )
            SELECT doc_id, rank, token, tf, score
            FROM ranked WHERE rank <= 5
            ORDER BY doc_id, rank
        """,
        # text_repetition: the Spark side counts lines/grams in one
        # Python hash-map pass; the oracle re-derives every signal
        # RELATIONALLY — unnest lines, window-number tokens, self-join
        # n-grams — over the same newline-injected fixture text.
        "text_repetition": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_replace(text, '(\S+ \S+) ', '\1' || chr(10), 'g') AS tx
              FROM documents
            ), ln AS (
              SELECT doc_id, unnest(string_split(tx, chr(10))) AS line FROM t
            ), lc AS (
              SELECT doc_id, line, count(*) AS c
              FROM ln WHERE line <> '' GROUP BY doc_id, line
            ), lstats AS (
              SELECT doc_id,
                     CAST(sum(c) AS INT) AS n_lines,
                     round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 4) AS dup_line_frac,
                     round(coalesce(sum(CASE WHEN c >= 2 THEN length(line) * c END), 0)
                           / CAST(sum(length(line) * c) AS DOUBLE), 4) AS dup_line_char_frac
              FROM lc GROUP BY doc_id
            ), raw AS (
              SELECT doc_id, length(tx) AS total,
                     unnest(string_split_regex(lower(tx), '\W+')) AS tok,
                     generate_subscripts(
                       string_split_regex(lower(tx), '\W+'), 1) AS pos
              FROM t
            ), tk AS (
              SELECT doc_id, total, tok,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
              FROM raw WHERE tok <> ''
            ), g2c AS (
              SELECT a.doc_id, max(a.total) AS total,
                     a.tok || ' ' || b.tok AS g, count(*) AS c
              FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.p = a.p + 1
              GROUP BY a.doc_id, a.tok || ' ' || b.tok
            ), top2 AS (
              SELECT doc_id,
                     round(max(c * length(g)) / CAST(max(total) AS DOUBLE), 4)
                       AS top_ngram_char_frac
              FROM g2c GROUP BY doc_id
            ), g3c AS (
              SELECT a.doc_id, max(a.total) AS total,
                     a.tok || ' ' || b.tok || ' ' || c3.tok AS g, count(*) AS c
              FROM tk a
              JOIN tk b ON b.doc_id = a.doc_id AND b.p = a.p + 1
              JOIN tk c3 ON c3.doc_id = a.doc_id AND c3.p = a.p + 2
              GROUP BY a.doc_id, a.tok || ' ' || b.tok || ' ' || c3.tok
            ), dup3 AS (
              SELECT doc_id,
                     round(least(
                       coalesce(sum(CASE WHEN c >= 2 THEN c * length(g) END), 0)
                         / CAST(max(total) AS DOUBLE), 1.0), 4)
                       AS dup_ngram_char_frac
              FROM g3c GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(l.n_lines, 0) AS n_lines,
                   coalesce(l.dup_line_frac, 0.0) AS dup_line_frac,
                   coalesce(l.dup_line_char_frac, 0.0) AS dup_line_char_frac,
                   coalesce(t2.top_ngram_char_frac, 0.0) AS top_ngram_char_frac,
                   coalesce(d3.dup_ngram_char_frac, 0.0) AS dup_ngram_char_frac
            FROM documents d
            LEFT JOIN lstats l ON l.doc_id = d.doc_id
            LEFT JOIN top2 t2 ON t2.doc_id = d.doc_id
            LEFT JOIN dup3 d3 ON d3.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # text_decontaminate: production joins md5-prefix gram hashes;
        # the oracle joins the raw 5-gram strings, so a green hash also
        # certifies zero md5-prefix collisions on this corpus.
        "text_decontaminate": r"""
            WITH raw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\W+')) AS tok,
                     generate_subscripts(
                       string_split_regex(lower(text), '\W+'), 1) AS pos
              FROM documents
            ), tk AS (
              SELECT doc_id, tok,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
              FROM raw WHERE tok <> ''
            ), dg AS (
              SELECT DISTINCT a.doc_id,
                     a.tok || ' ' || b.tok || ' ' || c.tok || ' ' ||
                     d.tok || ' ' || e.tok AS g
              FROM tk a
              JOIN tk b ON b.doc_id = a.doc_id AND b.p = a.p + 1
              JOIN tk c ON c.doc_id = a.doc_id AND c.p = a.p + 2
              JOIN tk d ON d.doc_id = a.doc_id AND d.p = a.p + 3
              JOIN tk e ON e.doc_id = a.doc_id AND e.p = a.p + 4
            ), bg AS (
              SELECT DISTINCT g FROM dg WHERE doc_id % 37 = 0
            ), hits AS (
              SELECT dg.doc_id, count(*) AS n
              FROM dg JOIN bg USING (g) GROUP BY dg.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
                   coalesce(h.n, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # text_pii_scrub: same doc_id-derived PII injection, then the
        # same Java-cap-RE2 regexes via DuckDB's RE2 — counts taken on
        # the progressively scrubbed text exactly like PII_PATTERNS.
        "text_pii_scrub": r"""
            WITH inj AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 5 = 0
                          THEN ' contact user' || doc_id || '@example.com soon'
                          ELSE '' END
                     || CASE WHEN doc_id % 7 = 0
                          THEN ' call +1 555 01' ||
                               lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' now'
                          ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                          THEN ' host 10.' || (doc_id % 256) || '.0.' ||
                               ((doc_id % 254) + 1) || ' end'
                          ELSE '' END AS t0
              FROM documents
            ), s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                     regexp_replace(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM inj
            ), s2 AS (
              SELECT doc_id, n_email,
                     len(regexp_extract_all(t1,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
                     regexp_replace(t1,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '<IP>', 'g') AS t2
              FROM s1
            ), s3 AS (
              SELECT doc_id, n_email, n_ipv4,
                     len(regexp_extract_all(t2, '\+[0-9][0-9 ()-]{6,}[0-9]')) AS n_phone,
                     regexp_replace(t2, '\+[0-9][0-9 ()-]{6,}[0-9]',
                       '<PHONE>', 'g') AS t3
              FROM s2
            )
            SELECT doc_id,
                   CAST(n_email AS INT) AS n_email,
                   CAST(n_ipv4 AS INT) AS n_ipv4,
                   CAST(n_phone AS INT) AS n_phone,
                   md5(t3) AS scrub_hash,
                   CAST(length(t3) AS INT) AS scrub_len
            FROM s3 ORDER BY doc_id
        """,
        # host_graph: hosts re-extracted from the raw URLs (lowercase
        # fold catches the upper-case fixture arm); self-loops
        # filtered; distinct endpoints via count(DISTINCT url).
        "host_graph": r"""
            WITH links AS (
              SELECT 'http://' || source || '.example.com/d/' || doc_id
                       AS src_url,
                     unnest([
                       'http://src' || ((doc_id * 7 + 1) % 23)
                         || '.example.com/d/' || (doc_id % 11),
                       'HTTP://SRC' || ((doc_id * 13 + 5) % 23)
                         || '.Example.COM/d/' || (doc_id % 5)
                     ]) AS dst_url
              FROM documents
            ), h AS (
              SELECT src_url, dst_url,
                     lower(regexp_extract(src_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)',
                       1)) AS src_host,
                     lower(regexp_extract(dst_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)',
                       1)) AS dst_host
              FROM links
            )
            SELECT src_host, dst_host,
                   CAST(count(*) AS BIGINT) AS n_links,
                   CAST(count(DISTINCT src_url) AS BIGINT) AS n_src_pages,
                   CAST(count(DISTINCT dst_url) AS BIGINT) AS n_dst_pages
            FROM h WHERE src_host <> dst_host
            GROUP BY src_host, dst_host
            ORDER BY src_host, dst_host
        """,
        # event_sessions: same two windows + rollup in SQL; epoch_ms
        # mirrors unix_millis exactly (integer milliseconds, so the
        # session boundary is engine-exact); ordering ties break by
        # event_id on both sides.
        "event_sessions": r"""
            WITH g AS (
              SELECT user_id, event_id, ts, event_type,
                     CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
                          WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                               > 360 * 60000 THEN 1
                          ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *,
                     sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM g
            )
            SELECT user_id,
                   CAST(session_seq AS BIGINT) AS session_seq,
                   min(ts) AS session_start,
                   max(ts) AS session_end,
                   CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT)
                     AS duration_ms,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
            FROM s GROUP BY user_id, session_seq
            ORDER BY user_id, session_seq
        """,
        "embedding_pca": _pca_sql(iters=3, d=64),
        # embedding_quantize: same per-element IEEE trajectory (cast
        # to DOUBLE first); max is order-free; sign*floor(+0.5) is the
        # shared half-away quantizer.
        "embedding_quantize": """
            WITH x AS (
              SELECT vec_id,
                     list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
              FROM embeddings
            ), s AS (
              SELECT vec_id, xd,
                     list_max(list_transform(xd, v -> abs(v))) AS scale
              FROM x
            ), c AS (
              SELECT vec_id, xd, scale,
                     CASE WHEN scale > 0 THEN
                       list_transform(xd, v -> CAST(sign(v)
                         * floor(abs(v) / scale * 127 + 0.5) AS BIGINT))
                     ELSE list_transform(xd, v -> CAST(0 AS BIGINT))
                     END AS codes
              FROM s
            )
            SELECT vec_id,
                   round(scale, 9) AS scale,
                   codes,
                   CASE WHEN scale > 0 THEN
                     floor(list_max(list_transform(
                       list_zip(xd, codes),
                       p -> abs(p[1] - p[2] * scale / 127))) * 1e9 + 0.5)
                     / 1e9
                   ELSE 0e0 END AS max_abs_err
            FROM c ORDER BY vec_id
        """,
        # corpus_split: same md5-prefix arithmetic; sorted-name ranges
        # test [0,1), train [1,99), val [99,100).
        "corpus_split": """
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5('split-v1:' || doc_id), 1, 8)
                             AS UBIGINT) % 100 AS BIGINT) AS bucket,
                   CASE
                     WHEN CAST('0x' || substr(md5('split-v1:' || doc_id), 1, 8)
                          AS UBIGINT) % 100 < 1 THEN 'test'
                     WHEN CAST('0x' || substr(md5('split-v1:' || doc_id), 1, 8)
                          AS UBIGINT) % 100 < 99 THEN 'train'
                     ELSE 'val'
                   END AS split
            FROM documents ORDER BY doc_id
        """,
        # frontier_priorities: template/host/trap relations recomposed
        # (same CTE shapes as frontier_traps), rank from host length,
        # priority = floor(rank*1e6+0.5) // (depth+1), traps -> -1.
        "frontier_priorities": """
            WITH u AS (
              SELECT doc_id,
                     'http://' || source || '.example.com'
                     || CASE WHEN doc_id % 13 = 0 THEN '/about'
                             WHEN doc_id % 3 = 0
                               THEN '/item/' || (doc_id % 7) || '/view'
                             ELSE '/page/' || doc_id END
                     || CASE WHEN doc_id % 2 = 0
                             THEN '?session=' || doc_id || '&lang=en'
                             ELSE '' END AS url,
                     CAST(doc_id % 4 AS BIGINT) AS depth
              FROM documents
            ), p AS (
              SELECT doc_id, url, depth,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)',
                       1)) AS host,
                     regexp_replace(
                       regexp_replace(url, '#.*$', ''),
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS rest
              FROM u
            ), t AS (
              SELECT doc_id, url, depth, host,
                     regexp_replace(
                       CASE WHEN regexp_replace(rest, '\\?.*$', '') = ''
                            THEN '/'
                            ELSE regexp_replace(rest, '\\?.*$', '') END,
                       '[0-9]+', 'N', 'g')
                     || CASE WHEN position('?' IN rest) > 0 THEN
                          '?' || array_to_string(list_sort(list_transform(
                            list_filter(string_split(
                              regexp_replace(rest, '^[^?]*\\?', ''), '&'),
                              x -> x <> ''),
                            x -> regexp_replace(x, '=.*$', ''))), '&')
                        ELSE '' END AS template
              FROM p
            ), traps AS (
              SELECT host, template
              FROM (SELECT DISTINCT host, template, url FROM t)
              GROUP BY host, template HAVING count(*) >= 10
            ), ranks AS (
              SELECT host, round((length(host) % 7 + 1) / 10.0, 6) AS rank
              FROM (SELECT DISTINCT host FROM t)
            )
            SELECT t.doc_id, t.url, t.host, t.depth,
                   (tr.host IS NOT NULL) AS is_trap,
                   CAST(CASE WHEN tr.host IS NOT NULL THEN -1
                        ELSE CAST(floor(coalesce(r.rank, 0) * 1000000 + 0.5)
                                  AS BIGINT) // (t.depth + 1)
                   END AS BIGINT) AS priority
            FROM t
            LEFT JOIN traps tr
              ON tr.host = t.host AND tr.template = t.template
            LEFT JOIN ranks r ON r.host = t.host
            ORDER BY t.doc_id
        """,
        "quality_percentile_cut": r"""
            WITH d AS (
              SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '')) AS BIGINT)
                       AS n_tokens
              FROM documents
            ), t AS (
              SELECT round(quantile_cont(n_tokens, 0.25), 6) AS threshold
              FROM d
            )
            SELECT d.doc_id, d.n_tokens, t.threshold,
                   d.n_tokens > t.threshold AS keep
            FROM d, t ORDER BY d.doc_id
        """,
        # text_scripts: RE2 \p{Script} spellings — an independent
        # formulation of the same Unicode property the Spark side
        # counts with Java \p{IsScript}; same injection, same argmax
        # (lexicographic names, strict >), same 4-dec half-up frac.
        "text_scripts": r"""
            WITH inj AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 5 = 1
                         THEN substr(text, 1, 5) || ' привет мир'
                       WHEN doc_id % 5 = 2
                         THEN substr(text, 1, 5) || ' 漢字文檔 支持'
                       WHEN doc_id % 5 = 3
                         THEN substr(text, 1, 5) || ' مرحبا بالعالم'
                       WHEN doc_id % 5 = 4
                         THEN substr(text, 1, 5) || ' γειά σου κόσμε'
                       ELSE text
                     END AS t
              FROM documents
            ), c AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(t, '\p{Arabic}'))
                          AS BIGINT) AS n_arabic,
                     CAST(len(regexp_extract_all(t, '\p{Cyrillic}'))
                          AS BIGINT) AS n_cyrillic,
                     CAST(len(regexp_extract_all(t, '\p{Greek}'))
                          AS BIGINT) AS n_greek,
                     CAST(len(regexp_extract_all(t, '\p{Han}'))
                          AS BIGINT) AS n_han,
                     CAST(len(regexp_extract_all(t, '\p{Latin}'))
                          AS BIGINT) AS n_latin
              FROM inj
            ), d AS (
              SELECT *,
                     n_arabic + n_cyrillic + n_greek + n_han + n_latin
                       AS n_scripted,
                     CASE
                       WHEN n_latin > greatest(n_arabic, n_cyrillic,
                                               n_greek, n_han)
                         THEN 'latin'
                       WHEN n_han > greatest(n_arabic, n_cyrillic, n_greek)
                         THEN 'han'
                       WHEN n_greek > greatest(n_arabic, n_cyrillic)
                         THEN 'greek'
                       WHEN n_cyrillic > n_arabic THEN 'cyrillic'
                       WHEN n_arabic > 0 THEN 'arabic'
                       ELSE 'none'
                     END AS dominant_script,
                     greatest(n_arabic, n_cyrillic, n_greek, n_han, n_latin)
                       AS best
              FROM c
            )
            SELECT doc_id, n_arabic, n_cyrillic, n_greek, n_han, n_latin,
                   CAST(n_scripted AS BIGINT) AS n_scripted,
                   dominant_script,
                   CASE WHEN n_scripted > 0
                        THEN floor(best / CAST(n_scripted AS DOUBLE)
                                   * 10000 + 5e-1) / 10000
                        ELSE 0e0 END AS dominant_frac
            FROM d ORDER BY doc_id
        """,
        # frontier_budget: Hamilton apportionment in BIGINTs — DuckDB
        # `//`/`%` mirror Spark's `div`/`%`; winners ranked by
        # (remainder desc, host asc); CASE on a NULL rank falls to 0.
        "frontier_budget": r"""
            WITH dem AS (
              SELECT source AS host, sum(n_chars) AS demand
              FROM documents GROUP BY source
            ), tot AS (
              SELECT sum(demand) AS d FROM dem
            ), b AS (
              SELECT host, demand,
                     (997 * demand) // (SELECT d FROM tot) AS base,
                     (997 * demand) % (SELECT d FROM tot) AS rem
              FROM dem
            ), ex AS (
              SELECT 997 - sum(base) AS n_extra FROM b
            ), rk AS (
              SELECT host,
                     row_number() OVER (ORDER BY rem DESC, host) AS rn
              FROM b WHERE rem > 0
            )
            SELECT b.host,
                   CAST(b.demand AS BIGINT) AS demand,
                   CAST(b.base AS BIGINT) AS base,
                   CAST(CASE WHEN rk.rn <= (SELECT n_extra FROM ex)
                             THEN 1 ELSE 0 END AS BIGINT) AS extra,
                   CAST(b.base + CASE WHEN rk.rn <= (SELECT n_extra FROM ex)
                                      THEN 1 ELSE 0 END AS BIGINT) AS budget
            FROM b LEFT JOIN rk USING (host) ORDER BY b.host
        """,
        # frontier_traps: template derivation replayed natively —
        # regexp_replace with 'g' for the digit fold (DuckDB is
        # first-match by default where Spark replaces all), param
        # names via list_transform + list_sort.
        "frontier_traps": r"""
            WITH u AS (
              SELECT DISTINCT
                     'http://' || source || '.example.com'
                     || CASE WHEN doc_id % 13 = 0 THEN '/about'
                             WHEN doc_id % 3 = 0
                               THEN '/item/' || (doc_id % 7) || '/view'
                             ELSE '/page/' || doc_id END
                     || CASE WHEN doc_id % 2 = 0
                             THEN '?session=' || doc_id || '&lang=en'
                             ELSE '' END AS url
              FROM documents
            ), p AS (
              SELECT url,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)',
                       1)) AS host,
                     regexp_replace(
                       regexp_replace(url, '#.*$', ''),
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS rest
              FROM u
            ), t AS (
              SELECT url, host,
                     regexp_replace(
                       CASE WHEN regexp_replace(rest, '\?.*$', '') = ''
                            THEN '/'
                            ELSE regexp_replace(rest, '\?.*$', '') END,
                       '[0-9]+', 'N', 'g')
                     || CASE WHEN position('?' IN rest) > 0 THEN
                          '?' || array_to_string(list_sort(list_transform(
                            list_filter(string_split(
                              regexp_replace(rest, '^[^?]*\?', ''), '&'),
                              x -> x <> ''),
                            x -> regexp_replace(x, '=.*$', ''))), '&')
                        ELSE '' END AS template
              FROM p
            )
            SELECT host, template,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   min(url) AS example_url,
                   count(*) >= 10 AS is_trap
            FROM t GROUP BY host, template
            ORDER BY host, template
        """,
        # text_vocab_stats: the classic word count replayed; same
        # injection; floor half-up quantizer.
        "text_vocab_stats": r"""
            WITH d AS (
              SELECT source,
                     text || CASE WHEN doc_id % 4 = 0
                                  THEN ' uniq' || doc_id ELSE '' END AS t
              FROM documents
            ), pairs AS (
              SELECT source,
                     unnest(string_split_regex(lower(t), '\W+')) AS tok
              FROM d
            ), c AS (
              SELECT source, tok, count(*) AS c
              FROM pairs WHERE tok <> '' GROUP BY source, tok
            )
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hapax,
                   floor(count(*) / CAST(sum(c) AS DOUBLE) * 10000 + 5e-1)
                     / 10000 AS ttr,
                   floor(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                         / CAST(greatest(count(*), 1) AS DOUBLE)
                         * 10000 + 5e-1) / 10000 AS hapax_frac
            FROM c GROUP BY source ORDER BY source
        """,
        # dedup_containment: raw 8-gram strings (vs production md5
        # hashes); same normalize; excerpt arm replayed with
        # list_slice on the single-spaced raw text.
        "dedup_containment": f"""
            WITH corp AS MATERIALIZED (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000,
                     array_to_string(list_slice(string_split(text, ' '),
                                                1, 12), ' ')
              FROM documents
            ), norm AS MATERIALIZED (
              SELECT doc_id, {_NORM_TEXT_SQL} AS t FROM corp
            ), g AS MATERIALIZED (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(1, len(string_split(t, ' ')) - 6),
                       i -> array_to_string(list_slice(string_split(t, ' '),
                              CAST(i AS INT), CAST(i + 7 AS INT)), ' '))))
                       AS s
              FROM norm WHERE len(string_split(t, ' ')) >= 8
            ), sizes AS MATERIALIZED (
              SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
            ), inter AS MATERIALIZED (
              SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
              FROM g x JOIN g y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT id_a, id_b,
                   round(i / CAST(least(sa.n, sb.n) AS DOUBLE), 4)
                     AS containment,
                   round(i / CAST(sa.n AS DOUBLE), 4) AS cont_a,
                   round(i / CAST(sb.n AS DOUBLE), 4) AS cont_b,
                   CAST(i AS BIGINT) AS n_shared
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.9
            ORDER BY id_a, id_b
        """,
        # text_winnow: same two frames (ROWS BETWEEN 3 PRECEDING AND
        # CURRENT ROW min; CURRENT ROW AND 3 FOLLOWING max-of-mins);
        # md5-prefix-15 hex -> BIGINT via the 0x cast; digest over the
        # position-ordered selected pairs.
        "text_winnow": r"""
            WITH g0 AS MATERIALIZED (
              SELECT doc_id,
                     unnest(list_transform(
                       range(1, greatest(length(text) - 4, 0) + 1),
                       i -> substr(text, CAST(i AS INT), 5))) AS gram,
                     generate_subscripts(list_transform(
                       range(1, greatest(length(text) - 4, 0) + 1),
                       i -> substr(text, CAST(i AS INT), 5)), 1) AS pos
              FROM documents
            ), g AS MATERIALIZED (
              SELECT doc_id, pos,
                     CAST(CAST('0x' || substr(md5(gram), 1, 15) AS UBIGINT)
                          AS BIGINT) AS h
              FROM g0
            ), wm AS MATERIALIZED (
              SELECT doc_id, pos, h,
                     min(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m
              FROM g
            ), cov AS MATERIALIZED (
              SELECT doc_id, pos, h,
                     max(m) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS c
              FROM wm
            ), sel AS MATERIALIZED (
              SELECT doc_id, pos, h, (c = h) AS s FROM cov
            ), agg AS MATERIALIZED (
              SELECT doc_id,
                     count(*) AS n_grams,
                     sum(CASE WHEN s THEN 1 ELSE 0 END) AS n_selected,
                     floor(sum(CASE WHEN s THEN 1 ELSE 0 END)
                           / CAST(count(*) AS DOUBLE) * 10000 + 5e-1)
                       / 10000 AS density,
                     md5(coalesce(string_agg(
                       CASE WHEN s THEN pos || ':' || h END, ' '
                       ORDER BY pos), '')) AS digest
              FROM sel GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(a.n_selected, 0) AS BIGINT) AS n_selected,
                   coalesce(a.density, 0e0) AS density,
                   coalesce(a.digest, md5('')) AS digest
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # text_unicode_norm: chr() builds the decomposed accent and BEL
        # so the SQL literal carries the same code points; nfc_normalize
        # + the same RE2 classes; length() counts code points on both
        # engines.
        "text_unicode_norm": r"""
            WITH inj AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 3 = 0
                          THEN ' cafe' || chr(769) || ' ole' || chr(769)
                          ELSE '' END
                     || CASE WHEN doc_id % 4 = 0
                          THEN ' bad' || chr(7) || 'ctl' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                          THEN '  double  spaced' ELSE '' END AS t
              FROM inj_src
            ), n AS (
              SELECT doc_id, t, nfc_normalize(t) AS c FROM inj
            ), cl AS (
              SELECT doc_id, t,
                     len(regexp_extract_all(c,
                       '[\x00-\x08\x0b-\x1f\x7f]')) AS n_ctrl,
                     trim(regexp_replace(regexp_replace(c,
                       '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
                       '[ \t]{2,}', ' ', 'g')) AS tn
              FROM n
            )
            SELECT doc_id,
                   CAST(n_ctrl AS BIGINT) AS n_ctrl,
                   tn <> t AS changed,
                   md5(tn) AS norm_hash,
                   CAST(length(tn) AS INT) AS norm_len
            FROM cl ORDER BY doc_id
        """.replace("inj_src", "documents"),
        # text_bigram_lm: model retrained in SQL (bigram/context/
        # unigram counts over the train split); score CASE ordered
        # exactly like the Spark when-chain; 4e-1 keeps alpha DOUBLE.
        "text_bigram_lm": r"""
            WITH d AS MATERIALIZED (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 5 = 0
                                  THEN ' zzqx' || (doc_id % 3)
                                  ELSE '' END AS t
              FROM documents
            ), tr AS MATERIALIZED (
              SELECT * FROM d WHERE doc_id % 3 <> 0
            ), ttk AS MATERIALIZED (
              SELECT doc_id, tok,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS p
              FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(t), '\W+')) AS tok,
                       generate_subscripts(
                         string_split_regex(lower(t), '\W+'), 1) AS pos
                FROM tr
              ) WHERE tok <> ''
            ), trb AS MATERIALIZED (
              SELECT a.doc_id, a.tok AS prev, b.tok AS w
              FROM ttk a JOIN ttk b
                ON b.doc_id = a.doc_id AND b.p = a.p + 1
            ), bc AS MATERIALIZED (
              SELECT prev, w, count(*) AS bc FROM trb GROUP BY prev, w
            ), cc AS MATERIALIZED (
              SELECT prev, count(*) AS cc FROM trb GROUP BY prev
            ), uni AS MATERIALIZED (
              SELECT tok AS w, count(*) AS uc FROM ttk GROUP BY tok
            ), nt AS MATERIALIZED (
              SELECT CAST(count(*) AS DOUBLE) AS n FROM ttk
            ), dtk AS MATERIALIZED (
              SELECT doc_id, tok,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS p
              FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(t), '\W+')) AS tok,
                       generate_subscripts(
                         string_split_regex(lower(t), '\W+'), 1) AS pos
                FROM d
              ) WHERE tok <> ''
            ), dtf AS MATERIALIZED (
              SELECT a.doc_id, a.tok AS prev, b.tok AS w, count(*) AS tf
              FROM dtk a JOIN dtk b
                ON b.doc_id = a.doc_id AND b.p = a.p + 1
              GROUP BY a.doc_id, a.tok, b.tok
            ), sc AS MATERIALIZED (
              SELECT dtf.doc_id, dtf.tf,
                     CAST(floor(-ln(
                       CASE WHEN bc.bc IS NOT NULL
                              THEN bc.bc / CAST(cc.cc AS DOUBLE)
                            WHEN uni.uc IS NOT NULL
                              THEN 4e-1 * uni.uc / (SELECT n FROM nt)
                            ELSE 4e-1 / (SELECT n FROM nt) END)
                       * 1000000 + 5e-1) AS BIGINT) AS nq,
                     CASE WHEN bc.bc IS NULL THEN 1 ELSE 0 END AS bo
              FROM dtf
              LEFT JOIN bc USING (prev, w)
              LEFT JOIN cc USING (prev)
              LEFT JOIN uni USING (w)
            ), pd AS MATERIALIZED (
              SELECT doc_id,
                     CAST(sum(tf) AS BIGINT) AS n_bigrams,
                     sum(tf * nq) AS tot,
                     CAST(sum(tf * bo) AS BIGINT) AS n_backoff
              FROM sc GROUP BY doc_id
            )
            SELECT dd.doc_id,
                   coalesce(p.n_bigrams, 0) AS n_bigrams,
                   round(coalesce(p.tot / (p.n_bigrams * 1000000e0), 0e0), 6)
                     AS avg_nll,
                   coalesce(p.n_backoff, 0) AS n_backoff
            FROM documents dd LEFT JOIN pd p USING (doc_id)
            ORDER BY dd.doc_id
        """,
        # text_line_filter: same synthesized 6-line doc; every rule
        # (word count, terminal punct, all-caps, bullet) replayed in
        # RE2; first-match cause attribution via the same CASE order.
        "text_line_filter": """
            WITH d AS (
              SELECT doc_id,
                     substr(text, 1, 30) || '.' || chr(10)
                     || 'ok' || chr(10)
                     || substr(text, 31, 25) || chr(10)
                     || 'NAVIGATION MENU BAR.' || chr(10)
                     || '- bullet item here.' || chr(10)
                     || CASE WHEN doc_id % 2 = 0
                             THEN 'extra valid sentence for parity.'
                             ELSE '' END AS t
              FROM documents
            ), ln0 AS (
              SELECT doc_id,
                     unnest(string_split(t, chr(10))) AS raw,
                     generate_subscripts(string_split(t, chr(10)), 1) AS pos
              FROM d
            ), ln AS (
              SELECT doc_id, pos, raw, trim(raw) AS l
              FROM ln0 WHERE trim(raw) <> ''
            ), c AS (
              SELECT doc_id, pos, raw,
                     CASE
                       WHEN len(list_filter(string_split_regex(l, '\\s+'),
                                            x -> x <> '')) < 3 THEN 'short'
                       WHEN NOT regexp_matches(l, '[.!?"'']$') THEN 'punct'
                       WHEN regexp_matches(l, '^[^a-z]*$')
                            AND length(regexp_replace(l, '[^A-Z]', '', 'g'))
                                >= 4 THEN 'caps'
                       WHEN regexp_matches(l, '^[-*•]\\s') THEN 'bullet'
                     END AS cause
              FROM ln
            ), agg AS (
              SELECT doc_id,
                     count(*) AS n_lines,
                     sum(CASE WHEN cause = 'short' THEN 1 ELSE 0 END)
                       AS n_short,
                     sum(CASE WHEN cause = 'punct' THEN 1 ELSE 0 END)
                       AS n_punct,
                     sum(CASE WHEN cause = 'caps' THEN 1 ELSE 0 END)
                       AS n_caps,
                     sum(CASE WHEN cause = 'bullet' THEN 1 ELSE 0 END)
                       AS n_bullet,
                     coalesce(string_agg(CASE WHEN cause IS NULL THEN raw END,
                                         chr(10) ORDER BY pos), '')
                       AS clean_text
              FROM c GROUP BY doc_id
            )
            SELECT dd.doc_id,
                   CAST(coalesce(a.n_lines, 0) AS BIGINT) AS n_lines,
                   CAST(coalesce(a.n_short, 0) AS BIGINT) AS n_short,
                   CAST(coalesce(a.n_punct, 0) AS BIGINT) AS n_punct,
                   CAST(coalesce(a.n_caps, 0) AS BIGINT) AS n_caps,
                   CAST(coalesce(a.n_bullet, 0) AS BIGINT) AS n_bullet,
                   coalesce(a.clean_text, '') AS clean_text
            FROM documents dd LEFT JOIN agg a ON a.doc_id = dd.doc_id
            ORDER BY dd.doc_id
        """,
        # text_charlm: the trigram model retrained in SQL (MATERIALIZED
        # CTEs — DuckDB re-inlines references otherwise); correlated
        # gram explode via unnest(list_transform(range(...))) in the
        # SELECT clause; constants in e-notation for DOUBLE typing; the
        # per-gram NLL quantization and integer doc sums replayed
        # exactly.
        "text_charlm": r"""
            WITH tr AS MATERIALIZED (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
            ), trg AS MATERIALIZED (
              SELECT unnest(list_transform(
                       range(1, greatest(length(text) - 2, 0) + 1),
                       i -> substr(text, CAST(i AS INT), 3))) AS gram
              FROM tr
            ), gc AS MATERIALIZED (
              SELECT gram, count(*) AS gc FROM trg GROUP BY gram
            ), cc AS MATERIALIZED (
              SELECT substr(gram, 1, 2) AS ctx, count(*) AS cc
              FROM trg GROUP BY substr(gram, 1, 2)
            ), v AS MATERIALIZED (
              SELECT CAST(count(DISTINCT ch) AS DOUBLE) AS v FROM (
                SELECT unnest(list_transform(
                         range(1, greatest(length(text), 0) + 1),
                         i -> substr(text, CAST(i AS INT), 1))) AS ch
                FROM tr
              )
            ), dg AS MATERIALIZED (
              SELECT doc_id, gram, substr(gram, 1, 2) AS ctx,
                     count(*) AS tf
              FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         range(1, greatest(length(text) - 2, 0) + 1),
                         i -> substr(text, CAST(i AS INT), 3))) AS gram
                FROM documents
              ) GROUP BY doc_id, gram, substr(gram, 1, 2)
            ), sc AS MATERIALIZED (
              SELECT dg.doc_id, dg.tf,
                     CAST(floor(-ln((coalesce(gc.gc, 0) + 1e0)
                                    / (coalesce(cc.cc, 0)
                                       + 1e0 * (SELECT v FROM v)))
                                * 1000000 + 5e-1) AS BIGINT) AS nq
              FROM dg
              LEFT JOIN gc USING (gram)
              LEFT JOIN cc USING (ctx)
            ), pd AS MATERIALIZED (
              SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_grams,
                     sum(tf * nq) AS tot
              FROM sc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(p.n_grams, 0) AS n_grams,
                   round(coalesce(p.tot / (p.n_grams * 1000000e0), 0e0), 6)
                     AS avg_nll,
                   round(exp(coalesce(p.tot / (p.n_grams * 1000000e0), 0e0)),
                         6) AS ppl
            FROM documents d LEFT JOIN pd p USING (doc_id)
            ORDER BY d.doc_id
        """,
        # search_postings / search_bm25: package-standard tokenizer
        # replayed via string_split_regex; BM25 constants written in
        # e-notation so DuckDB types them DOUBLE (bare 1.2 becomes
        # DECIMAL and exact-decimal math diverges from IEEE); the
        # quantized contributions are integer-valued doubles < 2^53,
        # so their sum is exact in any order on both engines.
        "search_postings": r"""
            WITH pairs AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\W+')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf
              FROM pairs WHERE token <> '' GROUP BY doc_id, token
            )
            SELECT token,
                   CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(tf) AS BIGINT) AS cf,
                   string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id)
                     AS postings
            FROM tf GROUP BY token ORDER BY token
        """,
        "search_bm25": r"""
            WITH pairs AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\W+')) AS token
              FROM documents
            ), nz AS (
              SELECT doc_id, token FROM pairs WHERE token <> ''
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf
              FROM nz GROUP BY doc_id, token
            ), dl AS (
              SELECT doc_id, count(*) AS dl FROM nz GROUP BY doc_id
            ), stats AS (
              SELECT count(*) AS n, round(avg(dl), 6) AS avgdl FROM dl
            ), q AS (
              SELECT * FROM tf WHERE token IN ('dup', 'spark', 'window')
            ), qdf AS (
              SELECT token, count(*) AS df FROM q GROUP BY token
            ), c AS (
              SELECT q.doc_id,
                     floor(round(ln(1e0 + (s.n - qdf.df + 5e-1)
                                          / (qdf.df + 5e-1)), 12)
                           * (q.tf * 2.2e0)
                           / (q.tf + 1.2e0
                              * (2.5e-1 + 7.5e-1 * dl.dl / s.avgdl))
                           * 1000000 + 5e-1) AS cq
              FROM q
              JOIN qdf USING (token)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
            ), agg AS (
              SELECT doc_id, sum(cq) / 1000000 AS score,
                     CAST(count(*) AS BIGINT) AS n_hits
              FROM c GROUP BY doc_id
            )
            SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank,
                   doc_id, score, n_hits
            FROM agg ORDER BY score DESC, doc_id LIMIT 20
        """,
        # text_boilerplate: same newline-injecting fixture; presence
        # counted on RAW lines (production uses md5(line) — a match
        # certifies collision-freedom); integer threshold; clean_text
        # rebuilt with ORDER BY pos string_agg (Spark: array_sort over
        # (pos,line) structs). DuckDB `/` on integers is float division
        # like Spark's, and floor(x*1e4+0.5)/1e4 is the shared half-up
        # quantizer.
        "text_boilerplate": r"""
            WITH t AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 3 <> 0
                          THEN 'nav menu ' || source || chr(10) ELSE '' END
                     || regexp_replace(text, '(\S+ \S+) ',
                                       '\1' || chr(10), 'g')
                     || CASE WHEN doc_id % 2 = 0
                          THEN chr(10) || 'footer ' || source || ' legal'
                          ELSE '' END AS tx
              FROM documents
            ), ln0 AS (
              SELECT doc_id, source,
                     unnest(string_split(tx, chr(10))) AS line,
                     generate_subscripts(string_split(tx, chr(10)), 1) AS pos
              FROM t
            ), ln AS (
              SELECT * FROM ln0 WHERE line <> ''
            ), nd AS (
              SELECT source, count(DISTINCT doc_id) AS n_docs
              FROM documents GROUP BY source
            ), pres AS (
              SELECT source, line, count(DISTINCT doc_id) AS n_with
              FROM ln GROUP BY source, line
            ), boiler AS (
              SELECT p.source, p.line
              FROM pres p JOIN nd ON nd.source = p.source
              WHERE nd.n_docs >= 2 AND p.n_with * 10000 >= 4000 * nd.n_docs
            ), tagged AS (
              SELECT l.doc_id, l.pos, l.line,
                     (b.line IS NOT NULL) AS is_b
              FROM ln l
              LEFT JOIN boiler b
                ON b.source = l.source AND b.line = l.line
            ), agg AS (
              SELECT doc_id,
                     count(*) AS n_lines,
                     sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS n_removed,
                     coalesce(string_agg(CASE WHEN NOT is_b THEN line END,
                                         chr(10) ORDER BY pos), '')
                       AS clean_text
              FROM tagged GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_lines, 0) AS BIGINT) AS n_lines,
                   CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
                   floor(coalesce(a.n_removed, 0)
                         / greatest(coalesce(a.n_lines, 0), 1) * 10000 + 0.5)
                     / 10000 AS removed_frac,
                   coalesce(a.clean_text, '') AS clean_text
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # text_span_dedup: production joins md5-prefix16 gram hashes;
        # the oracle joins the raw 8-gram strings (same proof shape as
        # text_decontaminate: green == hash family collision-free here).
        # Interval union replayed as the same running-max window.
        "text_span_dedup": r"""
            WITH raw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\W+')) AS tok,
                     generate_subscripts(
                       string_split_regex(lower(text), '\W+'), 1) AS pos
              FROM documents
            ), tk AS (
              SELECT doc_id, tok,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
              FROM raw WHERE tok <> ''
            ), tl AS (
              SELECT doc_id, list(tok ORDER BY p) AS toks FROM tk GROUP BY doc_id
            ), g AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS pos0,
                     array_to_string(
                       toks[CAST(u.i + 1 AS INT):CAST(u.i + 8 AS INT)], ' ') AS gram
              FROM tl, LATERAL unnest(range(greatest(len(toks) - 7, 0))) AS u(i)
            ), dupg AS (
              SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
            ), dp AS (
              SELECT g.doc_id, g.pos0 FROM g JOIN dupg USING (gram)
            ), cov AS (
              SELECT doc_id, pos0,
                     greatest(0, pos0 + 8 - greatest(coalesce(
                       max(pos0 + 8) OVER (
                         PARTITION BY doc_id ORDER BY pos0
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0), pos0)) AS new_cov
              FROM dp
            ), per AS (
              SELECT doc_id, count(*) AS n_dup, sum(new_cov) AS cov_tokens
              FROM cov GROUP BY doc_id
            ), base AS (
              SELECT d.doc_id, coalesce(c.n, 0) AS n_tokens
              FROM documents d
              LEFT JOIN (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id) c
                USING (doc_id)
            )
            SELECT b.doc_id,
                   CAST(b.n_tokens AS BIGINT) AS n_tokens,
                   CAST(greatest(0, b.n_tokens - 7) AS BIGINT) AS n_grams,
                   CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams,
                   CASE WHEN b.n_tokens - 7 > 0
                        THEN coalesce(p.n_dup, 0) / CAST(b.n_tokens - 7 AS DOUBLE)
                        ELSE 0.0 END AS dup_gram_frac,
                   CASE WHEN b.n_tokens > 0
                        THEN least(coalesce(p.cov_tokens, 0), b.n_tokens)
                             / CAST(b.n_tokens AS DOUBLE)
                        ELSE 0.0 END AS dup_token_frac
            FROM base b LEFT JOIN per p USING (doc_id)
            ORDER BY b.doc_id
        """,
        # text_pack_sequences: replay the md5 shard hash, the exclusive
        # per-shard running token sum, and the integer bin division.
        "text_pack_sequences": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(CAST('0x' || substr(
                       md5('shard42:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) % 8 AS BIGINT) AS shard,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            ), o AS (
              SELECT doc_id, shard, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_offset
              FROM t
            )
            SELECT doc_id, shard, n_tokens, start_offset,
                   CAST(CASE WHEN n_tokens > 0
                        THEN start_offset // 512 END AS BIGINT) AS first_bin,
                   CAST(CASE WHEN n_tokens > 0
                        THEN (start_offset + n_tokens - 1) // 512 END
                        AS BIGINT) AS last_bin,
                   CAST(CASE WHEN n_tokens > 0
                        THEN (start_offset + n_tokens - 1) // 512
                             - start_offset // 512 + 1
                        ELSE 0 END AS BIGINT) AS n_bins_spanned
            FROM o ORDER BY doc_id
        """,
        # text_pack_examples: the shard stream rebuilt relationally —
        # global pos = window cumsum + in-doc subscript, bin = pos//ctx,
        # content+order pinned by md5(string_agg ORDER BY pos).
        "text_pack_examples": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(CAST('0x' || substr(
                       md5('shard42:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) % 8 AS BIGINT) AS shard,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            ), o AS (
              SELECT doc_id, shard,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_offset
              FROM t
            ), raw AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS tok,
                     generate_subscripts(
                       string_split_regex(trim(text), '\s+'), 1) AS p
              FROM documents WHERE trim(text) <> ''
            ), tok AS (
              SELECT o.shard, o.start_offset + raw.p - 1 AS pos, raw.tok
              FROM raw JOIN o USING (doc_id)
            )
            SELECT shard, pos // 512 AS bin,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS tokens_md5
            FROM tok GROUP BY shard, pos // 512
            ORDER BY shard, bin
        """,
        # text_mixture_resample: one IEEE sqrt then exact integer /
        # HUGEINT arithmetic end-to-end — the value-hash match IS the
        # proof that the per-doc sampling decision replicates across
        # engines (no float-sum ordering, no libm pow anywhere).
        "text_mixture_resample": r"""
            WITH tokc AS (
              SELECT doc_id, source,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS doc_tokens
              FROM documents
            ), st AS (
              SELECT source, CAST(sum(doc_tokens) AS BIGINT) AS n_tokens
              FROM tokc GROUP BY source
            ), wi AS (
              SELECT source, n_tokens,
                     CAST(floor(sqrt(CAST(n_tokens * 1048576 AS DOUBLE)))
                          AS BIGINT) AS weight_num
              FROM st
            ), tot AS (
              SELECT CAST(sum(weight_num) AS BIGINT) AS wsum,
                     CAST(sum(n_tokens) AS BIGINT) AS tsum
              FROM wi
            ), per AS (
              SELECT source,
                     (tsum * weight_num) // (wsum * n_tokens) AS epochs,
                     (tsum * weight_num) % (wsum * n_tokens) AS rem_num,
                     wsum * n_tokens AS rem_den
              FROM wi, tot
            )
            SELECT t.doc_id, t.source, t.doc_tokens,
                   CAST(p.epochs
                        + CASE WHEN CAST(CAST('0x' || substr(
                              md5('mix:42:' || CAST(t.doc_id AS VARCHAR)), 1, 8)
                              AS UBIGINT) AS HUGEINT) * p.rem_den
                            < CAST(p.rem_num AS HUGEINT) * 4294967296
                          THEN 1 ELSE 0 END
                        AS BIGINT) AS n_copies
            FROM tokc t JOIN per p USING (source)
            ORDER BY t.doc_id
        """,
        # wet_roundtrip: the Spark side goes documents → WARC/WET files
        # on disk → record parser; the oracle reads the table directly.
        # Equal hashes == the container format is lossless end-to-end.
        "wet_roundtrip": r"""
            SELECT doc_id,
                   CAST(strlen(text) AS BIGINT) AS content_length,
                   md5(text) AS text_md5
            FROM documents ORDER BY doc_id
        """,
        "link_pagerank": _pagerank_sql(iters=5, damping=0.85),
        "link_hits": _hits_sql(iters=5),
        "host_pagerank": _host_pagerank_sql(iters=5, damping=0.85),
        "host_registered_domains": _psl_oracle_sql(),
        # recrawl_schedule: integer arithmetic end to end — `//` is
        # DuckDB's integer division (Spark side uses `div`); the
        # power-of-two clamp is the same CASE chain.
        "recrawl_schedule": r"""
            WITH hist AS (
              SELECT doc_id, r.round,
                     ((doc_id * 31 + r.round * 17) % 10) < (doc_id % 5)
                       AS changed
              FROM documents, (SELECT unnest(range(1, 7)) AS round) r
            ), agg AS (
              SELECT doc_id,
                     count(*) AS n_obs,
                     sum(CASE WHEN changed THEN 1 ELSE 0 END) AS n_changes,
                     max(round) AS last_round
              FROM hist GROUP BY doc_id
            ), iv AS (
              SELECT doc_id, n_obs, n_changes, last_round,
                     CASE WHEN (n_obs + 2) // (n_changes + 1) >= 8 THEN 8
                          WHEN (n_obs + 2) // (n_changes + 1) >= 4 THEN 4
                          WHEN (n_obs + 2) // (n_changes + 1) >= 2 THEN 2
                          ELSE 1 END AS revisit_interval
              FROM agg
            )
            SELECT doc_id,
                   CAST(n_obs AS BIGINT) AS n_obs,
                   CAST(n_changes AS BIGINT) AS n_changes,
                   round((n_changes + 1e0) / (n_obs + 2e0), 6) AS change_rate,
                   CAST(revisit_interval AS BIGINT) AS revisit_interval,
                   CAST(last_round + revisit_interval AS BIGINT) AS due_round
            FROM iv ORDER BY doc_id
        """,
        # cdx_index: the full SURT transform re-derived relationally
        # (DuckDB regexp_replace is first-match-only but every pattern
        # here is anchored; strftime/date_format both render in the
        # session/system timezone so the ts strings agree; md5 of the
        # ASCII payload and strlen == octet_length on both engines).
        "cdx_index": r"""
            WITH d AS (
              SELECT doc_id, text,
                     'HTTP://'
                     || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
                     || source || '.Example.COM'
                     || CASE WHEN doc_id % 5 = 0 THEN ':80'
                             WHEN doc_id % 7 = 0 THEN ':8080'
                             ELSE '' END
                     || '/Docs/' || doc_id
                     || CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN '#Frag' ELSE '' END
                       AS url,
                     to_timestamp(1700000000 + doc_id * 61) AS tsz
              FROM documents
            ), s AS (
              SELECT url, tsz, text,
                     regexp_replace(url, '#.*$', '') AS u
              FROM d
            ), p AS (
              SELECT url, tsz, text,
                     regexp_replace(
                       lower(regexp_extract(u,
                         '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)',
                         1)),
                       ':(80|443)$', '') AS host,
                     lower(regexp_replace(u,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '')) AS rest
              FROM s
            ), k AS (
              SELECT url, tsz, text,
                     array_to_string(list_reverse(string_split(
                       regexp_replace(host, ':[0-9]+$', ''), '.')), ',')
                     || regexp_extract(host, '(:[0-9]+)$', 1)
                     || ')'
                     || CASE WHEN regexp_replace(rest, '\?.*$', '') = ''
                             THEN '/'
                             ELSE regexp_replace(rest, '\?.*$', '') END
                     || CASE WHEN position('?' IN rest) > 0
                             THEN '?' || array_to_string(
                                    list_sort(string_split(
                                      regexp_replace(rest, '^[^?]*\?', ''),
                                      '&')), '&')
                             ELSE '' END AS surt
              FROM p
            )
            SELECT surt,
                   strftime(tsz, '%Y%m%d%H%M%S') AS ts,
                   url,
                   md5(text) AS digest,
                   CAST(strlen(text) AS BIGINT) AS length
            FROM k
            ORDER BY surt, ts, url
        """,
        # cdx_revisits / cdx_revisit_stats: clean-URL fixture so SURT
        # is a plain label reversal; both engines' windows default to
        # UNBOUNDED PRECEDING..CURRENT ROW so first_value(ts ORDER BY
        # ts, url) is the partition original on each side.
        "cdx_revisits": r"""
            WITH caps AS (
              SELECT 'com,example,' || source || ')/d/' || doc_id AS surt,
                     strftime(to_timestamp(1700000000 + r.round * 100000
                                           + doc_id),
                              '%Y%m%d%H%M%S') AS ts,
                     'http://' || source || '.example.com/d/' || doc_id
                       AS url,
                     md5(text || '#v' || ((doc_id * 31 + r.round * 7) % 3))
                       AS digest,
                     CAST(strlen(text || '#v'
                                 || ((doc_id * 31 + r.round * 7) % 3))
                          AS BIGINT) AS length
              FROM documents, (SELECT unnest(range(1, 5)) AS round) r
            ), w AS (
              SELECT *,
                     row_number() OVER
                       (PARTITION BY surt, digest ORDER BY ts, url) AS rn,
                     first_value(ts) OVER
                       (PARTITION BY surt, digest ORDER BY ts, url) AS f_ts
              FROM caps
            )
            SELECT surt, ts, url, digest, length,
                   CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END
                     AS record_type,
                   CASE WHEN rn > 1 THEN f_ts END AS refers_to_ts,
                   CAST(CASE WHEN rn = 1 THEN length ELSE 0 END AS BIGINT)
                     AS stored_length
            FROM w ORDER BY surt, ts, url
        """,
        "cdx_revisit_stats": r"""
            WITH caps AS (
              SELECT 'com,example,' || source || ')/d/' || doc_id AS surt,
                     strftime(to_timestamp(1700000000 + r.round * 100000
                                           + doc_id),
                              '%Y%m%d%H%M%S') AS ts,
                     'http://' || source || '.example.com/d/' || doc_id
                       AS url,
                     md5(text || '#v' || ((doc_id * 31 + r.round * 7) % 3))
                       AS digest,
                     CAST(strlen(text || '#v'
                                 || ((doc_id * 31 + r.round * 7) % 3))
                          AS BIGINT) AS length
              FROM documents, (SELECT unnest(range(1, 5)) AS round) r
            ), w AS (
              SELECT *,
                     row_number() OVER
                       (PARTITION BY surt, digest ORDER BY ts, url) AS rn
              FROM caps
            )
            SELECT surt,
                   count(*) AS n_captures,
                   count(DISTINCT digest) AS n_payloads,
                   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_revisits,
                   CAST(sum(length) AS BIGINT) AS bytes_fetched,
                   CAST(sum(CASE WHEN rn = 1 THEN length ELSE 0 END)
                        AS BIGINT) AS bytes_stored,
                   floor((sum(length)
                          - sum(CASE WHEN rn = 1 THEN length ELSE 0 END))
                         / greatest(sum(length), 1) * 10000 + 0.5) / 10000
                     AS saved_frac
            FROM w GROUP BY surt ORDER BY surt
        """,
        # cdx_retention: same clean-URL SURT; both retention windows
        # replayed (ts DESC, url ASC), month bucket = substr(ts,1,6).
        "cdx_retention": r"""
            WITH caps AS (
              SELECT 'com,example,' || source || ')/d/' || doc_id AS surt,
                     strftime(to_timestamp(1700000000 + r.round * 1728000
                                           + doc_id % 7200),
                              '%Y%m%d%H%M%S') AS ts,
                     'http://' || source || '.example.com/d/' || doc_id
                       AS url
              FROM documents, (SELECT unnest(range(1, 11)) AS round) r
            ), w AS (
              SELECT *,
                     row_number() OVER
                       (PARTITION BY surt ORDER BY ts DESC, url) AS rn,
                     row_number() OVER
                       (PARTITION BY surt, substr(ts, 1, 6)
                        ORDER BY ts DESC, url) AS mrn
              FROM caps
            )
            SELECT surt, ts, url,
                   (rn <= 2 OR mrn = 1) AS keep,
                   CASE WHEN rn <= 2 THEN 'recent'
                        WHEN mrn = 1 THEN 'monthly'
                        ELSE 'expired' END AS reason
            FROM w ORDER BY surt, ts
        """,
        # link_anchor_rollup: edge set + anchors + top-3 cut all
        # re-derived relationally (same dd/edges CTEs as pagerank's
        # oracle; DuckDB lists are 1-indexed where F.get is 0-based,
        # and both engines' concat_ws skips the NULL second token).
        "link_anchor_rollup": r"""
            WITH dd AS (
              SELECT doc_id, source, row_number() OVER
                (PARTITION BY source ORDER BY doc_id) AS rn
              FROM documents
            ), edges AS (
              SELECT a.doc_id AS s, b.doc_id AS t FROM dd a JOIN dd b
              ON a.source = b.source AND b.rn BETWEEN a.rn + 1 AND a.rn + 3
              WHERE a.doc_id % 7 < 4
            ), tt AS (
              SELECT doc_id AS t,
                     list_filter(string_split_regex(lower(text), '\W+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), links AS (
              SELECT e.t AS target_id,
                     CASE WHEN e.s % 2 = 0 THEN toks[1]
                          ELSE concat_ws(' ', toks[1], toks[2]) END AS anchor
              FROM edges e JOIN tt ON tt.t = e.t
            ), cnt AS (
              SELECT target_id, anchor, count(*) AS cnt
              FROM links GROUP BY target_id, anchor
            ), tot AS (
              SELECT target_id, CAST(sum(cnt) AS BIGINT) AS n_inlinks,
                     CAST(count(*) AS BIGINT) AS n_unique_anchors
              FROM cnt GROUP BY target_id
            ), rk AS (
              SELECT target_id, anchor, row_number() OVER
                (PARTITION BY target_id ORDER BY cnt DESC, anchor ASC) AS rk
              FROM cnt
            )
            SELECT t.target_id, t.n_inlinks, t.n_unique_anchors,
                   string_agg(r.anchor, '|' ORDER BY r.rk) AS top_anchors
            FROM tot t JOIN rk r USING (target_id) WHERE r.rk <= 3
            GROUP BY t.target_id, t.n_inlinks, t.n_unique_anchors
            ORDER BY target_id
        """,
        "corpus_diff": r"""
            WITH old AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
            ), new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 1 THEN text || ' v2' ELSE text END AS text
              FROM documents WHERE doc_id % 7 <> 3
            ), j AS (
              SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                     md5(o.text) AS oh, md5(n.text) AS nh,
                     (o.doc_id IS NULL) AS no_old, (n.doc_id IS NULL) AS no_new
              FROM old o FULL OUTER JOIN new n USING (doc_id)
            )
            SELECT doc_id,
                   CASE WHEN no_old THEN 'added'
                        WHEN no_new THEN 'removed'
                        WHEN oh <> nh THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM j ORDER BY doc_id
        """,
        # text_vocab_encode: vocabulary + id sequences rebuilt in SQL;
        # md5(string_agg ORDER BY pos) pins sequence content AND order.
        "text_vocab_encode": r"""
            WITH raw AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS token,
                     generate_subscripts(
                       string_split_regex(trim(text), '\s+'), 1) AS p
              FROM documents WHERE trim(text) <> ''
            ), cnt AS (
              SELECT token, count(*) AS n FROM raw GROUP BY token
            ), voc AS (
              SELECT token,
                     row_number() OVER (ORDER BY n DESC, token ASC) AS token_id
              FROM cnt ORDER BY n DESC, token ASC LIMIT 16
            ), ids AS (
              SELECT r.doc_id, r.p,
                     coalesce(v.token_id, 0) AS tid,
                     CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END AS oov
              FROM raw r LEFT JOIN voc v USING (token)
            ), agg AS (
              SELECT doc_id, count(*) AS n_ids,
                     sum(oov) * 1.0 / count(*) AS oov_frac,
                     md5(string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY p))
                       AS ids_md5
              FROM ids GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_ids, 0) AS BIGINT) AS n_ids,
                   coalesce(a.oov_frac, 0.0) AS oov_frac,
                   coalesce(a.ids_md5, md5('')) AS ids_md5
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """,
        # corpus_curate: all three pipeline stages recomposed in order —
        # prefilter causes, min-id dedup among passers, md5-ranked cap
        # over dedup survivors.
        "corpus_curate": rf"""
            WITH q AS (
              SELECT doc_id, source, text,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS n_tokens,
                     CASE WHEN length(text) > 0 THEN round((length(text)
                          - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                          * 1.0 / length(text), 4) ELSE 0.0 END AS punct_ratio,
                     CASE WHEN length(text) > 0 THEN round((length(text)
                          - length(regexp_replace(text, '[0-9]', '', 'g')))
                          * 1.0 / length(text), 4) ELSE 0.0 END AS digit_ratio
              FROM documents
            ), f AS (
              SELECT *, CASE WHEN n_tokens < 5 OR n_tokens > 100000 THEN 'len'
                             WHEN punct_ratio > 0.2 THEN 'punct'
                             WHEN digit_ratio > 0.3 THEN 'digit'
                             ELSE '' END AS cause
              FROM q
            ), h AS (
              SELECT *, md5({_NORM_TEXT_SQL}) AS th FROM f
            ), w AS (
              SELECT th, min(doc_id) AS win FROM h WHERE cause = '' GROUP BY th
            ), s AS (
              SELECT h.doc_id, h.source, h.n_tokens, h.cause,
                     (w.win = h.doc_id) AS is_win
              FROM h LEFT JOIN w USING (th)
            ), c AS (
              SELECT doc_id, row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                     ) AS rk
              FROM s WHERE cause = '' AND is_win
            ), st AS (
              SELECT s.doc_id, s.n_tokens,
                     CASE WHEN s.cause <> '' THEN 'filter:' || s.cause
                          WHEN NOT s.is_win THEN 'dedup'
                          WHEN c.rk IS NULL OR c.rk > 15 THEN 'cap'
                          ELSE '' END AS drop_stage
              FROM s LEFT JOIN c USING (doc_id)
            )
            SELECT doc_id, n_tokens, drop_stage, (drop_stage = '') AS kept
            FROM st ORDER BY doc_id
        """,
        # text_quality_model: every feature and the logistic layer
        # recomputed relationally; 6-decimal rounding hides ≤1-ulp libm
        # spread in ln/exp while still pinning the model exactly.
        "text_quality_model": r"""
            WITH t AS (
              SELECT doc_id, text,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS n_tokens,
                     length(text) AS n_chars,
                     length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                     length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
              FROM documents
            ), s AS (
              SELECT doc_id, n_tokens,
                     CASE WHEN n_chars > 0 THEN round(n_punct * 1.0 / n_chars, 4) ELSE 0.0 END AS punct_ratio,
                     CASE WHEN n_chars > 0 THEN round(n_digit * 1.0 / n_chars, 4) ELSE 0.0 END AS digit_ratio,
                     CASE WHEN n_alpha > 0 THEN round(n_upper * 1.0 / n_alpha, 4) ELSE 0.0 END AS upper_ratio,
                     CASE WHEN n_tokens > 0
                          THEN round((n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 4)
                          ELSE 0.0 END AS avg_token_len,
                     CASE WHEN n_tokens > 0 THEN round(
                       len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> list_contains(['a','and','as','for','in','is','it','of',
                                               'on','that','the','this','to','with'], x)))
                       * 1.0 / n_tokens, 4) ELSE 0.0 END AS stopword_ratio
              FROM t
            ), z AS (
              SELECT doc_id, n_tokens, stopword_ratio, avg_token_len,
                     -1.0 + 0.55 * ln(1.0 + n_tokens)
                          + (-4.0) * punct_ratio
                          + (-3.0) * digit_ratio
                          + (-1.5) * upper_ratio
                          + 2.5 * stopword_ratio
                          + (-0.6) * abs(avg_token_len - 5.0) AS zz
              FROM s
            )
            SELECT doc_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   stopword_ratio, avg_token_len,
                   round(zz, 6) AS model_logit,
                   round(1.0 / (1.0 + exp(-zz)), 6) AS model_score,
                   (round(1.0 / (1.0 + exp(-zz)), 6) >= 0.5) AS model_keep
            FROM z ORDER BY doc_id
        """,
        # sitemap_roundtrip: Spark goes documents → XML files on disk →
        # iterparse; the oracle reads the table directly.
        "sitemap_roundtrip": r"""
            SELECT doc_id,
                   'https://' || source || '.example/doc/' || doc_id AS loc,
                   '2026-01-' || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
                     AS lastmod,
                   ((doc_id % 9) + 1) / 10.0 AS priority
            FROM documents ORDER BY doc_id
        """,
        # host_blocklist: independent suffix formulation (LIKE '%.'||rule
        # vs Spark's suffix-explode) — the hash match proves semantics.
        "host_blocklist": r"""
            WITH h AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END
                     || 'h' || (doc_id % 23) || '.' || source || '.example' AS host
              FROM documents
            ), rules(rule) AS (
              VALUES ('src2.example'), ('h7.src0.example'), ('cdn.h3.src1.example')
            ), m AS (
              SELECT doc_id, rule,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY length(rule) DESC, rule DESC
                     ) AS rn
              FROM h JOIN rules r
                ON h.host = r.rule OR h.host LIKE '%.' || r.rule
            )
            SELECT h.doc_id, h.host,
                   (m.rule IS NOT NULL) AS blocked,
                   m.rule AS matched_rule
            FROM h LEFT JOIN (SELECT doc_id, rule FROM m WHERE rn = 1) m
              USING (doc_id)
            ORDER BY h.doc_id
        """,
        # host_stats: registered domain re-derived by regex (Spark
        # slices labels) — independent constructions.
        "host_stats": r"""
            WITH h AS (
              SELECT doc_id, source, text,
                     CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END
                     || 'h' || (doc_id % 23) || '.' || source || '.example' AS host
              FROM documents
            )
            SELECT regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS registered_domain,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+'))
                            END) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
            FROM h GROUP BY 1 ORDER BY 1
        """,
        "text_bpe_tokens": r"""
            WITH t AS (
              SELECT lang,
                     len(regexp_extract_all(text,
                         '[A-Za-z]+(?:''[a-z]+)?|[0-9]+|[^\sA-Za-z0-9]')) AS n_bpe
              FROM documents
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
                   round(avg(n_bpe), 4) AS avg_bpe_tokens
            FROM t GROUP BY lang ORDER BY lang
        """,
        "text_langid": _langid_sql(),
        # multimodal_decode: the Spark side round-trips real bytes
        # (encode_png/encode_wav → stdlib decoders); the oracle derives
        # the expected dimensions/durations from the same doc_id
        # arithmetic the fixture generator uses — an independent
        # recomputation, not a re-decode.
        "multimodal_decode": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                   TRUE AS ok,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 13 ELSE 0 END AS INT) AS width,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 3 + doc_id % 7 ELSE 0 END AS INT) AS height,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 100 + 5 * (doc_id % 50) END AS INT) AS duration_ms
            FROM documents WHERE doc_id < 64 ORDER BY media_id
        """,
        # multimodal_resize: the oracle RE-DERIVES every resized pixel —
        # src index via the floor mapping, pixel value via the fixture's
        # (idx*31 + id*7919) % 256 arithmetic — then sums channel 0.
        # Matching pix_sum/corners proves real decode + resize, not an
        # echo of metadata.
        "multimodal_resize": """
            WITH img AS (
              SELECT doc_id AS media_id,
                     4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
              FROM documents
              WHERE doc_id < 64 AND doc_id % 2 = 0 AND doc_id % 8 <> 0
            ),
            px AS (
              -- channel-0 source value: PNG pixels are RGB-interleaved
              -- (sample index = (y*w+x)*3), GIF legs (media_id%8=4) are
              -- grayscale-palette (index = y*w+x) — same modular hash
              SELECT i.media_id, gy.y, gx.x,
                     (((((gy.y * i.h) // 6) * i.w + ((gx.x * i.w) // 8))
                        * (CASE WHEN i.media_id % 8 = 4 THEN 1 ELSE 3 END)) * 31
                      + i.media_id * 7919) % 256 AS v
              FROM img i
              CROSS JOIN generate_series(0, 5) AS gy(y)
              CROSS JOIN generate_series(0, 7) AS gx(x)
            )
            SELECT media_id, TRUE AS ok,
                   CAST(8 AS INT) AS out_w, CAST(6 AS INT) AS out_h,
                   CAST(sum(v) AS BIGINT) AS pix_sum,
                   CAST(max(CASE WHEN y = 0 AND x = 0 THEN v END) AS INT) AS px_first,
                   CAST(max(CASE WHEN y = 5 AND x = 7 THEN v END) AS INT) AS px_last
            FROM px GROUP BY media_id ORDER BY media_id
        """,
        # multimodal_frame_sample: sampled indices + all metadata
        # re-derived from id arithmetic (scalar generate_series +
        # unnest — DuckDB's table-function form can't take lateral
        # column args)
        "multimodal_frame_sample": """
            WITH v AS (
              SELECT doc_id AS media_id, 3 + doc_id % 5 AS nf,
                     4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
              FROM documents WHERE doc_id < 48
            )
            SELECT media_id,
                   CAST(unnest(generate_series(0, nf - 1, 2)) AS INT) AS frame_idx,
                   TRUE AS ok,
                   CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                   CAST(nf AS INT) AS n_frames,
                   CAST(nf * 100 AS INT) AS duration_ms
            FROM v ORDER BY media_id, frame_idx
        """,
        "multimodal_resample": """
            SELECT doc_id AS media_id, TRUE AS ok,
                   CAST(2000 AS INT) AS out_rate,
                   CAST((800 + 40 * (doc_id % 50)) // 4 AS INT) AS n_out,
                   CAST(((800 + 40 * (doc_id % 50)) // 4) * 1000 // 2000 AS INT)
                     AS out_duration_ms
            FROM documents
            WHERE doc_id < 64 AND doc_id % 2 = 1
            ORDER BY media_id
        """,
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_ivf_topk": _ann_ivf_sql(),
        "ann_pq_topk": _pq_sql(m=8, ks=64, k=50),
        # dedup_simhash: full SQL replica of the signature computation —
        # both engines hash tokens with substr(md5(tok),1,16) (the
        # shared family adopted in r3 exactly so this oracle can exist);
        # bits come from hex-nibble shifts, the ±1 fold is a GROUP BY
        # sum, and the pair set is the exact hamming≤r cross join (the
        # pigeonhole banding in Spark has recall 1.0 by construction, so
        # candidate banding must reproduce the exact answer; the query
        # entry passes max_bucket=None, so banding is lossless by
        # construction, not merely because the cap happens not to bind).
        # Zero-token docs carry the all-zero signature on both sides.
        "dedup_simhash": f"""
            WITH norm AS (
              SELECT doc_id AS id, {_NORM_TEXT_SQL} AS t FROM documents
            ),
            toks AS (
              SELECT id, unnest(list_filter(string_split(t, ' '), x -> x <> '')) AS tok
              FROM norm
            ),
            h AS (SELECT id, substr(md5(tok), 1, 16) AS hx FROM toks),
            bits AS (
              SELECT id, g.i AS bit,
                     CASE WHEN ((strpos('0123456789abcdef', substr(hx, (g.i // 4) + 1, 1)) - 1)
                                >> (3 - (g.i % 4))) & 1 = 1 THEN 1 ELSE -1 END AS pm
              FROM h, generate_series(0, 63) AS g(i)
            ),
            sums AS (SELECT id, bit, sum(pm) AS s FROM bits GROUP BY id, bit),
            sim0 AS (
              SELECT id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY bit) AS sim
              FROM sums GROUP BY id
            ),
            sim AS (
              SELECT n.id, coalesce(s0.sim, repeat('0', 64)) AS sim
              FROM (SELECT id FROM norm WHERE t IS NOT NULL) n
              LEFT JOIN sim0 s0 USING (id)
            ),
            -- production banding replica: max_hamming=8 -> 9 segments of
            -- 64//9 = 7 bits (bit 64 rides in no band, exactly like the
            -- Spark substring loop), capped at 200 members per
            -- (band, bucket) by the same id-ordered row_number window
            -- as dedup.py simhash_pairs
            banded AS (
              SELECT id, g.s AS band, substr(sim, g.s * 7 + 1, 7) AS bucket
              FROM sim, generate_series(0, 8) AS g(s)
            ),
            capped AS (
              SELECT id, band, bucket FROM (
                SELECT id, band, bucket,
                       row_number() OVER (PARTITION BY band, bucket ORDER BY id) AS rn
                FROM banded
              ) WHERE rn <= 200
            ),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM capped a
              JOIN capped b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
            )
            SELECT c.id_a, c.id_b,
                   CAST(hamming(sa.sim, sb.sim) AS INT) AS hamming
            FROM cand c
            JOIN sim sa ON sa.id = c.id_a
            JOIN sim sb ON sb.id = c.id_b
            WHERE hamming(sa.sim, sb.sim) <= 8
            ORDER BY id_a, id_b
        """,
        # text_fingerprint: same shared md5-prefix family; windows are
        # 8-token slices (list_slice clamps past the end exactly like
        # Spark's slice), digests sort lexicographically identically
        # (lowercase hex) on both sides.
        "text_fingerprint": r"""
            WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
            toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '') AS tk
              FROM d WHERE text IS NOT NULL
            ),
            wins AS (
              -- scalar generate_series (returns a LIST) + unnest: the
              -- table-function form can't reference tk laterally
              SELECT doc_id,
                     substr(md5(array_to_string(list_slice(tk, i + 1, i + 8), ' ')), 1, 16) AS sh
              FROM (
                SELECT doc_id, tk,
                       unnest(generate_series(0, greatest(len(tk) - 8, 0))) AS i
                FROM toks
              )
            ),
            agg AS (
              SELECT doc_id, string_agg(sh, ',' ORDER BY sh) AS joined
              FROM wins GROUP BY doc_id
            )
            SELECT d.doc_id, substr(md5(a.joined), 1, 16) AS fingerprint
            FROM d LEFT JOIN agg a USING (doc_id)
            ORDER BY doc_id
        """,
    }
