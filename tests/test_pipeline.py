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
