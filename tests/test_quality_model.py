"""Model-based quality scoring: fixed logistic layer over the native
quality features."""

import math

import pyspark.sql.functions as F

from walker_spark.functions.text import QUALITY_LOGIT_WEIGHTS, quality_logit


def test_quality_logit_matches_reference_math(spark):
    rows = [
        (0, "the cat sat on the mat and it was a fine day for sitting"),
        (1, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),          # punct soup
        (2, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19"),  # digit soup
        (3, ""),                                                  # empty
        (4, "SHOUTING IN ALL CAPS IS NOT QUALITY PROSE AT ALL"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_logit(df).collect()}

    w = QUALITY_LOGIT_WEIGHTS
    for did, _text in rows:
        r = out[did]
        z = (
            w["bias"]
            + w["log_tokens"] * math.log1p(r["n_tokens"])
            + w["punct_ratio"] * r["punct_ratio"]
            + w["digit_ratio"] * r["digit_ratio"]
            + w["upper_ratio"] * r["upper_ratio"]
            + w["stopword_ratio"] * r["stopword_ratio"]
            + w["avg_token_len_dev"] * abs(r["avg_token_len"] - 5.0)
        )
        assert abs(r["model_logit"] - round(z, 6)) < 2e-6
        assert abs(r["model_score"] - round(1 / (1 + math.exp(-z)), 6)) < 2e-6
        assert r["model_keep"] == (r["model_score"] >= 0.5)

    # ordering sanity: prose beats noise
    assert out[0]["model_score"] > out[1]["model_score"]
    assert out[0]["model_score"] > out[2]["model_score"]
    assert out[0]["model_score"] > out[4]["model_score"]
    assert out[0]["model_keep"] and not out[1]["model_keep"]


def test_quality_logit_custom_weights_and_plan(spark):
    df = spark.createDataFrame(
        [(i, "some plain words here " * (1 + i % 3)) for i in range(10)],
        "doc_id long, text string",
    )
    # all-zero weights except bias → score is sigmoid(bias) everywhere
    zero = {k: 0.0 for k in QUALITY_LOGIT_WEIGHTS}
    zero["bias"] = 2.0
    out = quality_logit(df, weights=zero).select("model_score").distinct().collect()
    assert len(out) == 1
    assert abs(out[0]["model_score"] - round(1 / (1 + math.exp(-2.0)), 6)) < 1e-9
    # pure projection: no Exchange in the plan
    plan = quality_logit(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
