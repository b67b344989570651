"""Checkpoint/resume exactness (north rule): a crawl killed after round
k and resumed from the manifest must end with byte-equal state to an
uninterrupted run — same seen set, same results (urls, codes, depths,
rounds), same round count."""

import pytest
import os

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
    spec = SiteSpec(seed=11, n_hosts=2, n_pages=40)
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
    assert s_res["rounds"] > 3  # the kill really was mid-crawl
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


# compaction + resume byte-equality sweep (resume exactness itself stays default) — ~1 min; VERDICT r4 #4 suite-wall triage
@pytest.mark.slow
def test_seen_compaction_resume_exact(spark, tmp_path):
    """Compaction (every k rounds the seen deltas fold into one dir) must
    not change anything observable: same rounds, same seen set, same
    results as an uncompacted run, including across a kill/resume that
    straddles a compaction point."""
    spec = SiteSpec(seed=11, n_hosts=2, n_pages=28)
    paths = write_pages_tables(spark, spec, str(tmp_path / "site"))
    store = build_store(spec)

    def mk(ckpt, max_rounds=0, compact_every=0):
        c = _mk(spark, paths, store, ckpt, max_rounds=max_rounds)
        c.conf.host_budget = 3  # small budget → many rounds
        c.seen_compact_every = compact_every
        return c

    plain = mk(str(tmp_path / "plain"))
    s_plain = plain.run()
    assert s_plain["rounds"] >= 5  # ≥2 compaction points at every 2 rounds

    # One compacted crawl, killed after 3 rounds (straddles the 2-round
    # compaction point) and resumed: comparing its final state against
    # the UNcompacted uninterrupted run proves both properties at once —
    # compaction changes nothing observable AND resume across a
    # compaction boundary is exact. (r3: the previous extra full
    # compacted run asserted a subset of this, for 1/3 more wall; r4:
    # 28 pages / compact-every-2 keeps two straddled compaction points
    # with ~2 fewer driver rounds per crawl.)
    part = mk(str(tmp_path / "part"), max_rounds=3, compact_every=2)
    part.run()
    resumed = mk(str(tmp_path / "part"), compact_every=2)
    s_res = resumed.run(resume=True)
    assert s_res["rounds"] == s_plain["rounds"]  # total rounds, absolute
    assert os.path.isdir(os.path.join(str(tmp_path / "part"), "seen_compact"))

    key = lambda r: (r["url"], r["code"], r["depth"], r["round"])  # noqa: E731
    assert sorted(key(r) for r in resumed.results_df().collect()) == sorted(
        key(r) for r in plain.results_df().collect()
    )
    assert {r["url"] for r in resumed.seen_df().collect()} == {
        r["url"] for r in plain.seen_df().collect()
    }
