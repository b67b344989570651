"""Benchmark harness — prints ONE JSON line.

Headline: crawl throughput (URLs scheduled+fetched per second) over a
deterministic synthetic Common-Crawl-style frontier, measured at two
parallelism levels (local[N/4] and local[N]) to evidence the north
rule's scaling-efficiency criterion (N vs 4N executors stand-in), plus
per-query wall times for the representative operator suite at
$SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_PAGES / _HOSTS to resize the crawl site,
     SPARK_GRAFT_SKIP_SCALING=1 to run the crawl at full cores only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
N_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "24"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"

BENCH_QUERIES = [
    "a1_event_histogram",
    "a2_latency_buckets",
    "w4_top20_truncation",
    "j3_broken_links",
    "tpch_revenue_by_nation",
    "tpch_pricing_summary",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_token_counts",
    "ann_cosine_topk",
    "ann_lsh_topk",
]


def _spark(cores: int):
    from walker_spark.session import get_spark

    s = get_spark(
        app_name=f"walker-spark-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _site_dir() -> str:
    return f"/tmp/walker_spark_bench_site_{N_HOSTS}x{N_PAGES}"


def gen_site(spark) -> dict[str, str]:
    from walker_spark.sources.synthetic import SiteSpec, write_pages_tables

    out = _site_dir()
    spec = SiteSpec(seed=42, n_hosts=N_HOSTS, n_pages=N_PAGES)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return {
            k: f"{out}/{k}.parquet"
            for k in ("pages", "redirect_edges", "robots", "seeds")
        }
    shutil.rmtree(out, ignore_errors=True)
    paths = write_pages_tables(spark, spec, out)
    open(marker, "w").write("ok")
    return paths


def run_crawl(spark, paths, tag: str) -> dict:
    from walker_spark.config import CrawlConfig, Target
    from walker_spark.plans.crawl import Crawler
    from walker_spark.sources.synthetic import SiteSpec, host_name, robots_body

    spec = SiteSpec(seed=42, n_hosts=N_HOSTS, n_pages=N_PAGES)
    robots = {
        host_name(h): robots_body(spec, h)
        for h in range(N_HOSTS)
        if robots_body(spec, h) is not None
    }
    seeds = [f"https://{host_name(h)}/" for h in range(N_HOSTS)]
    conf = CrawlConfig(
        target=Target(base_url=f"https://{host_name(0)}", paths=["/"]),
        host_budget=int(os.environ.get("SPARK_GRAFT_HOST_BUDGET", "2000")),
        agent="walker-spark",
        group_header="group",
    )
    ckpt = f"/tmp/walker_spark_bench_ckpt_{tag}"
    shutil.rmtree(ckpt, ignore_errors=True)
    crawler = Crawler(
        spark,
        conf,
        pages=spark.read.parquet(paths["pages"]),
        redirect_edges=spark.read.parquet(paths["redirect_edges"]),
        robots_bodies=robots,
        checkpoint_dir=ckpt,
        multi_host=True,
        seeds=seeds,
    )
    t0 = time.time()
    summary = crawler.run()
    wall = time.time() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "wall": round(wall, 2),
        "fetched": summary["total_fetched"],
        "rounds": summary["rounds"],
        "urls_per_sec": round(summary["total_fetched"] / wall, 2),
    }


def main():
    out: dict = {"sf": SF_DIR, "queries": {}}

    # --- operator suite at full cores ---
    import __spark_entry__ as entrymod

    spark = _spark(CPUS)
    qs = entrymod.queries()
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        dt = round(time.time() - t0, 3)
        out["queries"][name] = dt
        out.setdefault("query_rows", {})[name] = n
        total += dt

    # --- crawl throughput at full cores ---
    paths = gen_site(spark)
    crawl_hi = run_crawl(spark, paths, f"c{CPUS}")
    out["queries"]["crawl_bsp"] = crawl_hi["wall"]
    total += crawl_hi["wall"]
    out["crawl"] = {f"local[{CPUS}]": crawl_hi}
    spark.stop()

    # --- scaling: same crawl at quarter cores ---
    if not SKIP_SCALING:
        lo_cores = max(1, CPUS // 4)
        spark_lo = _spark(lo_cores)
        crawl_lo = run_crawl(spark_lo, paths, f"c{lo_cores}")
        spark_lo.stop()
        out["crawl"][f"local[{lo_cores}]"] = crawl_lo
        # efficiency = throughput_4N / (4 * throughput_N)
        eff = crawl_hi["urls_per_sec"] / (
            (CPUS / lo_cores) * crawl_lo["urls_per_sec"]
        )
        out["scaling_efficiency"] = round(eff, 3)

    out["metric"] = (
        "walker_spark bench: crawl URLs fetched+scheduled/s "
        f"(local[{CPUS}] vs local[{max(1, CPUS // 4)}]) + operator suite seconds"
    )
    out["value"] = round(total, 3)
    out["unit"] = "sec"
    out["crawl_urls_per_sec"] = crawl_hi["urls_per_sec"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
