"""Checkpoint/resume exactness (north rule): a crawl killed after round
k and resumed from the manifest must end with byte-equal state to an
uninterrupted run — same seen set, same results (urls, codes, depths,
rounds), same round count."""

import pyspark.sql.functions as F

from walker_spark.config import CrawlConfig, Target
from walker_spark.plans.crawl import Crawler
from walker_spark.sources.synthetic import SiteSpec, build_store, write_pages_tables


def _mk(spark, paths, store, ckpt, max_rounds=0):
    conf = CrawlConfig(
        target=Target(base_url="https://host-0000.example", paths=["/"]),
        host_budget=8,
        group_header="group",
        agent="walker-spark",
        max_rounds=max_rounds,
    )
    return Crawler(
        spark,
        conf,
        pages=spark.read.parquet(paths["pages"]),
        redirect_edges=spark.read.parquet(paths["redirect_edges"]),
        robots_bodies=store.robots,
        checkpoint_dir=ckpt,
        use_bloom=False,
    )


def test_resume_exactness(spark, tmp_path):
    spec = SiteSpec(seed=11, n_hosts=2, n_pages=60)
    site = str(tmp_path / "site")
    paths = write_pages_tables(spark, spec, site)
    store = build_store(spec)

    full = _mk(spark, paths, store, str(tmp_path / "full"))
    s_full = full.run()

    # killed after 3 rounds…
    part = _mk(spark, paths, store, str(tmp_path / "part"), max_rounds=3)
    part.run()
    # …and resumed to fixpoint by a FRESH crawler on the same checkpoint
    resumed = _mk(spark, paths, store, str(tmp_path / "part"))
    s_res = resumed.run(resume=True)

    assert s_res["rounds"] == s_full["rounds"]
    # the resumed run fetches exactly what the killed run hadn't
    assert s_res["total_fetched"] == s_full["total_fetched"] - sum(
        m.fetched for m in part.metrics
    )

    seen_full = {r["url"] for r in full.seen_df().collect()}
    seen_res = {r["url"] for r in resumed.seen_df().collect()}
    assert seen_res == seen_full

    key = lambda r: (r["url"], r["code"], r["depth"], r["round"])  # noqa: E731
    res_full = sorted(key(r) for r in full.results_df().collect())
    res_res = sorted(key(r) for r in resumed.results_df().collect())
    assert res_res == res_full
