from pyspark.sql import functions as F


def test_allocate_host_budget_hamilton(spark):
    from walker_spark.operators.frontier import allocate_host_budget

    dem = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2)], "host string, demand long"
    )
    out = {r["host"]: r for r in allocate_host_budget(dem, 7).collect()}
    # D=10: bases 3/2/1 (sum 6), remainders 5/1/4 -> the 1 leftover to a
    assert (out["a"]["base"], out["b"]["base"], out["c"]["base"]) == (3, 2, 1)
    assert out["a"]["extra"] == 1 and out["b"]["extra"] == 0
    assert sum(r["budget"] for r in out.values()) == 7
    assert (out["a"]["budget"], out["b"]["budget"], out["c"]["budget"]) == (4, 2, 1)


def test_allocate_host_budget_ties_and_edges(spark):
    from walker_spark.operators.frontier import allocate_host_budget

    # remainder tie (5 vs 5) -> host-ascending wins
    dem = spark.createDataFrame(
        [("x", 5), ("y", 3), ("z", 2)], "host string, demand long"
    )
    out = {r["host"]: r for r in allocate_host_budget(dem, 25).collect()}
    # D=10: bases 12/7/5 (sum 24), remainders 5/5/0 -> extra to x
    assert out["x"]["budget"] == 13 and out["y"]["budget"] == 7
    assert sum(r["budget"] for r in out.values()) == 25

    # zero-demand host gets zero; total still exact
    dem2 = spark.createDataFrame(
        [("a", 0), ("b", 4)], "host string, demand long"
    )
    out2 = {r["host"]: r for r in allocate_host_budget(dem2, 9).collect()}
    assert out2["a"]["budget"] == 0 and out2["b"]["budget"] == 9

    # all-zero demand: nothing allocated, no division blow-up
    dem3 = spark.createDataFrame([("a", 0)], "host string, demand long")
    assert allocate_host_budget(dem3, 5).collect()[0]["budget"] == 0


def test_allocate_host_budget_partitioning_invariant(spark):
    from walker_spark.operators.frontier import allocate_host_budget

    dem = spark.createDataFrame(
        [(f"h{i:03d}", (i * 37) % 101 + 1) for i in range(50)],
        "host string, demand long",
    )
    a = allocate_host_budget(dem, 997).collect()
    b = allocate_host_budget(dem.repartition(9), 997).collect()
    assert {(r["host"], r["budget"]) for r in a} == {
        (r["host"], r["budget"]) for r in b
    }
    assert sum(r["budget"] for r in a) == 997


def test_url_trap_templates(spark):
    from walker_spark.operators.frontier import url_trap_templates

    urls = (
        [(f"http://ex.com/cal/2024/{i}/{i%28+1}",) for i in range(30)]
        + [("http://ex.com/about",), ("http://ex.com/about",)]  # dup URL
        + [(f"http://ex.com/p?id={i}&ses=zz{i}",) for i in range(5)]
        + [("http://other.com/cal/1/2/3#frag",)]
    )
    df = spark.createDataFrame(urls, "url string")
    out = {(r["host"], r["template"]): r for r in url_trap_templates(df, trap_threshold=20).collect()}
    cal = out[("ex.com", "/cal/N/N/N")]
    assert cal["n_urls"] == 30 and cal["is_trap"]
    assert cal["example_url"] == "http://ex.com/cal/2024/0/1"
    about = out[("ex.com", "/about")]
    assert about["n_urls"] == 1 and not about["is_trap"]  # distinct URLs
    q = out[("ex.com", "/p?id&ses")]
    assert q["n_urls"] == 5 and not q["is_trap"]
    # fragment dropped; host split
    assert out[("other.com", "/cal/N/N/N")]["n_urls"] == 1


def test_frontier_priorities(spark):
    from walker_spark.operators.frontier import (
        frontier_priorities,
        url_trap_templates,
    )

    frontier = spark.createDataFrame(
        [
            ("http://a.com/cal/1/2", 0),
            ("http://a.com/cal/3/4", 1),
            ("http://a.com/about", 2),
            ("http://b.com/page", 0),
        ],
        "url string, depth long",
    )
    ranks = spark.createDataFrame(
        [("a.com", 0.5), ("b.com", 0.25)], "host string, rank double"
    )
    traps = url_trap_templates(frontier.select("url"), trap_threshold=2)
    out = {(r["url"]): r for r in frontier_priorities(
        frontier, host_ranks=ranks, trap_templates=traps
    ).collect()}
    # /cal/N/N appears twice -> trap at threshold 2 -> priority -1
    assert out["http://a.com/cal/1/2"]["is_trap"] and out["http://a.com/cal/1/2"]["priority"] == -1
    assert out["http://a.com/cal/3/4"]["priority"] == -1
    # rank 0.5 -> 500000, depth 2 -> div 3
    assert not out["http://a.com/about"]["is_trap"]
    assert out["http://a.com/about"]["priority"] == 500000 // 3
    assert out["http://b.com/page"]["priority"] == 250000

    # missing signals degrade gracefully
    bare = {r["url"]: r for r in frontier_priorities(frontier).collect()}
    assert all(r["priority"] == 0 and not r["is_trap"] for r in bare.values())


def test_streaming_traps_match_batch(spark, tmp_path):
    """Replay a URL stream in two waves through a query restart; the
    final flagged (host, template) set and saturating counts must
    match the batch trap detector on the same URLs."""
    from walker_spark.operators.frontier import url_trap_templates
    from walker_spark.streaming.frontier import streaming_trap_templates

    urls = (
        [(f"http://ex.com/cal/{i}/{i % 12}",) for i in range(40)]
        + [("http://ex.com/about",)] * 3          # dup URL: distinct=1
        + [(f"http://ex.com/p?id={i}",) for i in range(8)]
    )
    df = spark.createDataFrame(urls, "url string")
    batch = {
        (r["host"], r["template"]): (r["n_urls"], r["is_trap"])
        for r in url_trap_templates(df, trap_threshold=10).collect()
    }
    assert batch[("ex.com", "/cal/N/N")][1] is True

    src, ck, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    w1 = df.limit(20)
    w2 = df.subtract(w1).union(w1.limit(5))  # overlap re-sends dups

    def run_once():
        stream = spark.readStream.schema("url string").parquet(src)

        def emit(b, _e):
            b.write.mode("append").parquet(sink)

        q = (
            streaming_trap_templates(stream, trap_threshold=10)
            .writeStream.foreachBatch(emit)
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    w1.coalesce(1).write.mode("append").parquet(src)
    run_once()
    w2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # distinct-set state rides the checkpoint

    got_rows = spark.read.parquet(sink).groupBy("host", "template").agg(
        F.max("n_urls").alias("n"), F.max("is_trap").alias("t")
    ).collect()
    got = {(r["host"], r["template"]): (r["n"], r["t"]) for r in got_rows}
    assert set(got) == set(batch)
    for k, (bn, bt) in batch.items():
        gn, gt = got[k]
        assert gt == bt, k
        # counts saturate at the threshold once flagged
        assert gn == (min(bn, 10) if bt else bn), k
