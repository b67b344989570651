"""End-to-end curation pipeline: stage ordering, attribution, and
composability of the individual gates."""

import pyspark.sql.functions as F

from walker_spark.pipeline import curate_corpus


def test_curate_corpus_stages(spark):
    rows = [
        # survivors (distinct, prose-y, enough tokens)
        (0, "the quick brown fox jumps over the lazy dog today", "en", "a"),
        (1, "a different sentence with plenty of ordinary words in it", "en", "a"),
        # duplicate of 0 (punctuation/case-insensitive normalize) → dedup
        (2, "The quick brown fox jumps over the lazy dog today!", "en", "a"),
        # too short → filter:len  (and NOT charged to dedup)
        (3, "too short", "en", "a"),
        # digit soup → filter:digit
        (4, "1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6", "en", "b"),
        # punct soup → filter:punct
        (5, "!!! ??? *** ((( ))) ;;; ::: ,,, ... ---", "en", "b"),
        # survivor in b
        (6, "yet another plain document that is long enough to pass", "en", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["doc_id"]: r for r in curate_corpus(df).collect()}
    assert out[0]["kept"] and out[0]["drop_stage"] == ""
    assert out[1]["kept"] and out[6]["kept"]
    assert out[2]["drop_stage"] == "dedup"        # min-id winner is 0
    assert out[3]["drop_stage"] == "filter:len"
    assert out[4]["drop_stage"] == "filter:digit"
    assert out[5]["drop_stage"] == "filter:punct"


def test_curate_corpus_cap_and_order(spark):
    # 12 distinct long docs in one stratum; cap 3 → exactly 3 kept,
    # and the capped docs are attributed 'cap', not 'dedup'
    rows = [
        (i, f"document number {i} with enough distinct words to pass the length gate", "en", "s")
        for i in range(12)
    ] + [
        (100, "document number 0 with enough distinct words to pass the length gate", "en", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["doc_id"]: r for r in curate_corpus(df, cap_per_stratum=3).collect()}
    kept = [i for i, r in out.items() if r["kept"]]
    assert len(kept) == 3
    assert out[100]["drop_stage"] == "dedup"      # dup of doc 0, id 0 wins
    stages = {r["drop_stage"] for r in out.values()}
    assert stages <= {"", "dedup", "cap"}
    assert sum(1 for r in out.values() if r["drop_stage"] == "cap") == 9
    # deterministic under repartitioning
    again = {r["doc_id"]: r["drop_stage"] for r in
             curate_corpus(df.repartition(5), cap_per_stratum=3).collect()}
    assert again == {i: r["drop_stage"] for i, r in out.items()}


def test_corpus_diff(spark):
    from walker_spark.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(0, "same"), (1, "will change"), (2, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(0, "same"), (1, "changed now"), (3, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {0: "unchanged", 1: "changed", 2: "removed", 3: "added"}


def test_recrawl_schedule_semantics(spark):
    from walker_spark.pipeline import recrawl_schedule

    # page 1 never changes, page 2 changes every round, page 3 once
    hist = spark.createDataFrame(
        [(p, r, ch) for p, flags in [(1, [0] * 6), (2, [1] * 6), (3, [0, 0, 1, 0, 0, 0])]
         for r, ch in enumerate(flags, start=1)],
        "doc_id long, round long, changed int",
    ).withColumn("changed", F.col("changed").cast("boolean"))
    out = {r["doc_id"]: r for r in recrawl_schedule(hist, max_interval=64).collect()}
    # never changed: (6+2) div (0+1) = 8 -> interval 8, due 6+8
    assert out[1]["revisit_interval"] == 8 and out[1]["due_round"] == 14
    # always changed: (8) div (7) = 1 -> min interval
    assert out[2]["revisit_interval"] == 1 and out[2]["due_round"] == 7
    # one change: 8 div 2 = 4
    assert out[3]["revisit_interval"] == 4
    assert abs(out[3]["change_rate"] - round(2 / 8, 6)) < 1e-9

    # clamping
    clamped = {r["doc_id"]: r for r in recrawl_schedule(hist, max_interval=4).collect()}
    assert clamped[1]["revisit_interval"] == 4


def test_recrawl_schedule_from_corpus_diff(spark):
    from walker_spark.pipeline import corpus_diff, recrawl_schedule

    snap = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    s1 = snap([(1, "a"), (2, "x")])
    s2 = snap([(1, "a"), (2, "y")])
    s3 = snap([(1, "a"), (2, "y")])
    hist = (
        corpus_diff(s1, s2).withColumn("round", F.lit(1))
        .unionByName(corpus_diff(s2, s3).withColumn("round", F.lit(2)))
        .select("doc_id", "round", (F.col("status") == "changed").alias("changed"))
    )
    out = {r["doc_id"]: r for r in recrawl_schedule(hist).collect()}
    assert out[2]["n_changes"] == 1 and out[1]["n_changes"] == 0
    assert out[1]["revisit_interval"] > out[2]["revisit_interval"]


def test_split_corpus(spark):
    from walker_spark.pipeline import split_corpus

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = split_corpus(docs, weights={"train": 8, "val": 1, "test": 1}).collect()
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert 0 <= r["bucket"] < 10
    # hash buckets track the 8/1/1 parts
    assert 1400 < counts["train"] < 1800
    assert 100 < counts["val"] < 320 and 100 < counts["test"] < 320

    # pure projection: identical under repartitioning, stable per id
    again = {r["doc_id"]: r["split"] for r in split_corpus(
        docs.repartition(7), weights={"train": 8, "val": 1, "test": 1}
    ).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out)

    # a different seed reshuffles assignments
    other = {r["doc_id"]: r["split"] for r in split_corpus(
        docs, weights={"train": 8, "val": 1, "test": 1}, seed="v2"
    ).collect()}
    assert any(other[r["doc_id"]] != r["split"] for r in out)

    # growing the corpus never moves existing docs between splits
    grown = {r["doc_id"]: r["split"] for r in split_corpus(
        spark.range(0, 3000).withColumnRenamed("id", "doc_id"),
        weights={"train": 8, "val": 1, "test": 1},
    ).collect()}
    assert all(grown[r["doc_id"]] == r["split"] for r in out)


def test_streaming_recrawl_matches_batch(spark, tmp_path):
    """Replay the change-observation stream in two waves through a
    query restart; the final per-page emission must equal the batch
    recrawl_schedule rows exactly (integer arithmetic both sides)."""
    from walker_spark.pipeline import recrawl_schedule
    from walker_spark.streaming.recrawl import streaming_recrawl_schedule

    rows = [
        (p, r, ((p * 31 + r * 17) % 10) < (p % 5))
        for p in range(40)
        for r in range(1, 7)
    ]
    hist = spark.createDataFrame(rows, "doc_id long, round long, changed boolean")
    batch = {
        r["doc_id"]: (r["n_obs"], r["n_changes"], r["change_rate"],
                      r["revisit_interval"], r["due_round"])
        for r in recrawl_schedule(hist, max_interval=8).collect()
    }

    src, ck, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    w1 = hist.filter("round <= 3")
    w2 = hist.filter("round > 3")

    def run_once():
        stream = spark.readStream.schema(
            "doc_id long, round long, changed boolean"
        ).parquet(src)

        def emit(b, _e):
            b.write.mode("append").parquet(sink)

        q = (
            streaming_recrawl_schedule(stream, max_interval=8)
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
    run_once()  # counters continue from checkpointed state

    final = {}
    for r in spark.read.parquet(sink).collect():
        cur = final.get(r["id"])
        if cur is None or r["n_obs"] > cur[0]:
            final[r["id"]] = (r["n_obs"], r["n_changes"], r["change_rate"],
                              r["revisit_interval"], r["due_round"])
    assert final == batch
