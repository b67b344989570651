import math

from pyspark.sql import functions as F


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple cherry cherry date"),
            (4, "date elderberry"),
        ],
        "doc_id long, text string",
    )


def test_posting_lists(spark):
    from walker_spark.operators.search import posting_lists

    rows = {r["token"]: r for r in posting_lists(_corpus(spark)).collect()}
    assert rows["apple"]["df"] == 2 and rows["apple"]["cf"] == 3
    assert rows["apple"]["postings"] == "1:2 3:1"
    assert rows["cherry"]["postings"] == "2:1 3:2"
    assert rows["elderberry"]["df"] == 1 and rows["elderberry"]["postings"] == "4:1"
    # tokenizer: case-folding and punctuation splits
    one = spark.createDataFrame([(9, "Apple, APPLE!! apple?")], "doc_id long, text string")
    got = posting_lists(one).collect()
    assert len(got) == 1 and got[0]["token"] == "apple" and got[0]["cf"] == 3


def test_bm25_hand_computed(spark):
    from walker_spark.operators.search import bm25_topk

    # query 'apple': df=2, N=4, dl = [3,2,4,2], avgdl=2.75
    out = bm25_topk(_corpus(spark), ["apple"], k=10, k1=1.2, b=0.75).collect()
    assert [r["doc_id"] for r in out] == [1, 3]

    def contrib(tf, dl):
        idf = round(math.log(1 + (4 - 2 + 0.5) / (2 + 0.5)), 12)
        x = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.75))
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert out[0]["score"] == contrib(2, 3)
    assert out[1]["score"] == contrib(1, 4)
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2
    assert out[0]["n_hits"] == 1


def test_bm25_multi_term_and_stability(spark):
    from walker_spark.operators.search import bm25_topk

    docs = _corpus(spark)
    base = bm25_topk(docs, ["apple", "cherry"], k=4).collect()
    assert {r["doc_id"] for r in base} == {1, 2, 3}
    by_id = {r["doc_id"]: r for r in base}
    assert by_id[3]["n_hits"] == 2 and by_id[1]["n_hits"] == 1
    # doc 3 matches both terms -> ranks first
    assert base[0]["doc_id"] == 3

    # bit-stable under repartitioning (integer-grid summation)
    again = bm25_topk(docs.repartition(7), ["apple", "cherry"], k=4).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in again] == [
        (r["rank"], r["doc_id"], r["score"]) for r in base
    ]

    # uppercase + duplicate query terms normalize away
    up = bm25_topk(docs, ["APPLE", "apple", "Cherry"], k=4).collect()
    assert [(r["doc_id"], r["score"]) for r in up] == [
        (r["doc_id"], r["score"]) for r in base
    ]
