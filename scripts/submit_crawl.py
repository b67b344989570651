"""spark-submit entry point — the north rule's deployment mode
(``spark-submit --py-files``), runnable as:

    python -c "import shutil; shutil.make_archive('/tmp/walker_spark', 'zip', '<repo>', 'walker_spark')"
    /opt/spark/bin/spark-submit --master local[4] \
        --conf spark.sql.shuffle.partitions=8 \
        --py-files /tmp/walker_spark.zip \
        scripts/submit_crawl.py <site_dir> <checkpoint_dir>

The script imports ``walker_spark`` from the ``--py-files`` zip (no
repo on PYTHONPATH — tests/test_submit.py runs it from a scrubbed
environment), generates the synthetic site, crawls it to fixpoint, and
prints one ``@@SUBMIT {json}`` line. Executor python workers resolve
the package from the same zip (Spark adds py-files to every worker's
sys.path), which is exactly how a multi-executor cluster would receive
the engine.

Unlike the library's ``get_spark``, this builds the session WITHOUT
``.master(...)``: under spark-submit, master/deploy-mode/resources
belong to the submit command, and overriding them in code would defeat
``--master yarn``/``k8s`` deployments. Only engine-required settings
(Arrow for the pandas-UDF extract stage) are set here, with
everything else deferring to ``--conf``.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    site_dir, ckpt_dir = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.appName("walker-spark-submit")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from walker_spark.config import CrawlConfig, Target
    from walker_spark.plans.crawl import Crawler
    from walker_spark.sources.synthetic import SiteSpec, build_store, write_pages_tables

    spec = SiteSpec(seed=7, n_hosts=2, n_pages=30)
    paths = write_pages_tables(spark, spec, site_dir)
    store = build_store(spec)
    conf = CrawlConfig(
        target=Target(base_url="https://host-0000.example", paths=["/"]),
        host_budget=12,
        group_header="group",
        agent="walker-spark",
    )
    crawler = Crawler(
        spark,
        conf,
        pages=spark.read.parquet(paths["pages"]),
        redirect_edges=spark.read.parquet(paths["redirect_edges"]),
        robots_bodies=store.robots,
        checkpoint_dir=ckpt_dir,
    )
    summary = crawler.run()
    codes = {
        r["code"]: r["cnt"]
        for r in crawler.results_df().groupBy("code").count().withColumnRenamed("count", "cnt").collect()
    }
    print(
        "@@SUBMIT "
        + json.dumps(
            {
                "fetched": summary["total_fetched"],
                "rounds": summary["rounds"],
                "codes": codes,
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
