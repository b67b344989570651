"""Dedup + similarity operators: exactness, LSH recall vs exact oracle,
simhash banding completeness."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "The quick brown fox, jumps over the lazy dog again and again!"),  # normalized dup
        (3, "the quick brown fox jumps over the very lazy dog again and again"),  # near dup
        (4, "completely different text about spark dataframes and shuffles"),
        (5, "totally unrelated content regarding bloom filters and crawling"),
        (6, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from walker_spark.operators.dedup import exact_dedup

    groups = exact_dedup(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_dups"] == 3 and g["keep_id"] == 0 and g["dup_ids"] == [0, 1, 2]


def test_ngram_jaccard_oracle(docs):
    from walker_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 2)] == 1.0
    assert (0, 3) in pairs and (0, 6) in pairs
    assert (0, 4) not in pairs and (4, 5) not in pairs


def test_minhash_lsh_matches_exact_oracle(docs):
    """Property (SURVEY §5.4 flavor): LSH-found pairs at high threshold
    must equal the exact Jaccard pairs (banding recall at j≥0.7 with
    16 bands × 4 rows is ~1 for this scale)."""
    from walker_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.7).collect()
    }
    # verification step makes precision exact; banding gives recall
    assert lsh == exact and len(exact) >= 3


def test_simhash_finds_near_dups(docs):
    from walker_spark.operators.dedup import simhash_pairs

    pairs = {(r["id_a"], r["id_b"]) for r in simhash_pairs(docs, max_hamming=6).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert (4, 5) not in pairs


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype("float32")
    # make 3 clusters by copying with small noise
    rows = []
    for i in range(40):
        v = base[i % 10] + 0.05 * base[i]
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vectors):
    from walker_spark.operators.similarity import cosine_topk

    q = vectors.filter(F.col("vec_id") < 3)
    res = cosine_topk(vectors, q, k=5)
    rows = res.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        cos = [r["cos"] for r in rs]
        assert cos == sorted(cos, reverse=True)
        # nearest neighbor of i should be i+10 or i+20 (same cluster)
        assert rs[0]["neighbor_id"] % 10 == qid % 10


def test_lsh_topk_recall(vectors):
    from walker_spark.operators.similarity import cosine_topk, lsh_cosine_topk

    q = vectors.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(vectors, q, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_cosine_topk(vectors, q, k=3, bands=12, rows_per_band=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_ivf_topk_recall(vectors):
    from walker_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    q = vectors.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(vectors, q, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(vectors, q, k=3, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall}"


def test_connected_components(spark):
    """Label propagation must converge to min-reachable-id components:
    a chain (worst-case diameter), a star, a singleton pair, and an
    isolated clique — verified against a hand oracle; determinism via
    a second run."""
    from walker_spark.operators.dedup import connected_components

    edges = [
        # chain 1-2-3-4-5 (diameter stresses the fixpoint loop)
        (1, 2), (2, 3), (3, 4), (4, 5),
        # star centered at 10
        (10, 11), (10, 12), (10, 13),
        # pair
        (20, 21),
        # clique given redundantly in both orders
        (30, 31), (31, 32), (30, 32), (32, 30),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
              10: 10, 11: 10, 12: 10, 13: 10,
              20: 20, 21: 20,
              30: 30, 31: 30, 32: 30}
    assert got == expect
    # pathological: loop bound raises loudly instead of mislabeling
    # (the 1-5 chain needs 4 propagation rounds)
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=2)


def test_embedding_near_dup_lsh_matches_exact(vectors):
    from walker_spark.operators.similarity import embedding_near_dup_pairs

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(vectors, threshold=0.9, exact=True).collect()
    }
    assert exact  # clustered fixture has close pairs
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            vectors, threshold=0.9, bands=12, rows_per_band=4
        ).collect()
    }
    # verification makes precision exact; banding recall ≥ high at cos≥0.9
    assert lsh.issubset(exact)
    assert len(lsh) / len(exact) >= 0.9


def test_embedding_lsh_multiprobe_recall(spark):
    """Pins the q_embedding_near_dup CORRECTNESS contract (VERDICT r3
    #1): on BOTH driver embeddings fixtures (sf0.01 and sf0.1) at the
    entry's exact parameters (threshold 0.4, bands=8, rows=8,
    probe_bits=3, seed 42), multi-probe banding recall is exactly 1.0,
    so the production LSH plan — a band equi-join, no cartesian
    product — reproduces the exact cross-join answer everywhere the
    driver runs it. probe_bits=2 measured 0.990 recall at sf0.1 — the
    cap-didn't-bind-at-this-SF failure shape ADVICE flagged on simhash;
    if fixture or banding drift ever costs a pair, this fails before
    the driver's gate does."""
    import os

    import hashlib

    import pytest

    from walker_spark.operators.similarity import embedding_near_dup_pairs

    def lsh_pairs(fixture):
        emb = spark.read.parquet(fixture).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        df = embedding_near_dup_pairs(
            emb, threshold=0.4, exact=False, probe_bits=3, eager=False
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        return emb, sorted((r["id_a"], r["id_b"]) for r in df.collect())

    fx01 = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(fx01):
        pytest.skip("driver fixtures not present")
    # sf0.01: LSH vs exact computed live
    emb, lsh = lsh_pairs(fx01)
    exact = sorted(
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.4, exact=True).collect()
    )
    assert exact and lsh == exact
    # sf0.1: LSH vs a pinned golden of the exact answer (920 pairs,
    # sha256 of the sorted pair list — recomputing the O(n²) exact join
    # here cost ~15 s of suite wall for the same assertion)
    fx1 = "/root/testdata/sf0.1/embeddings.parquet"
    if os.path.exists(fx1):
        _, lsh1 = lsh_pairs(fx1)
        assert len(lsh1) == 920
        assert (
            hashlib.sha256(str(lsh1).encode()).hexdigest()
            == "8365b97420d695ab85361af6e938f5c59f14351d7dc224ec4fba3bb5d84e22c4"
        )


def test_multimodal_plumbing(spark):
    from walker_spark.operators.multimodal import (
        attach_media_metadata,
        decode_and_featurize,
    )

    rows = [
        (1, "image", "image/png", 3, 0, 0, 0, bytearray(b"abc")),
        (2, "audio", "audio/wav", 4, 0, 0, 120, bytearray(b"defg")),
        (3, "image", "image/png", 3, 0, 0, 0, bytearray(b"abc")),  # dup blob
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, n_bytes long, "
        "width int, height int, duration_ms int, blob binary",
    )
    meta = attach_media_metadata(df)
    hashes = {r["media_id"]: r["content_hash"] for r in meta.collect()}
    assert hashes[1] == hashes[3] != hashes[2]

    feats = decode_and_featurize(df, decoder="fake").collect()
    assert all(r["ok"] for r in feats)
    by_id = {r["media_id"]: r["feat"] for r in feats}
    assert by_id[1] == by_id[3] != by_id[2]
    assert len(by_id[1]) == 16

    stub = decode_and_featurize(df, decoder="stub").collect()
    assert all(not r["ok"] and "decoder" in r["err"] for r in stub)


def test_text_analytics(spark):
    from walker_spark.functions.text import language_id_udf, quality_metrics

    rows = [
        (1, "The quick brown fox and the lazy dog of the town in the morning.", "en"),
        (2, "Der schnelle braune Fuchs springt über den faulen Hund und die Katze.", "de"),
        (3, "Le renard brun rapide saute par dessus le chien paresseux dans la rue.", "fr"),
        (4, "这是一个中文测试文档，包含足够多的中文字符来触发检测。", "zh"),
        (5, "12345 67890 !!! ???", "unk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, want string")
    got = {r["doc_id"]: r["pred"] for r in df.withColumn("pred", language_id_udf()(F.col("text"))).collect()}
    assert got[1] == "en" and got[2] == "de" and got[4] == "zh"

    q = quality_metrics(df).collect()
    m = {r["doc_id"]: r for r in q}
    assert m[1]["n_tokens"] == 14
    assert m[1]["quality_score"] > m[5]["quality_score"]
    assert 0 <= m[1]["stopword_ratio"] <= 1


def test_xxh64_numpy_matches_spark(spark):
    """The vectorized minhash path relies on a numpy replica of Spark's
    XxHash64 on LongType inputs; pin bit-exactness, including the
    two-column fold xxhash64(h, s) = hashLong(s, hashLong(h, 42))."""
    import numpy as np

    from walker_spark.operators.dedup import _xxh64_long

    vals = [0, 1, -1, 42, -9223372036854775808, 9223372036854775807, 123456789123456789]
    seeds = [0, 1, 5, 127]
    rows = [(v, s) for v in vals for s in seeds]
    df = spark.createDataFrame(rows, "h long, s long")
    got = {
        (r["h"], r["s"]): r["x"]
        for r in df.select("h", "s", F.xxhash64("h", "s").alias("x")).collect()
    }
    for v in vals:
        t = _xxh64_long(np.array([v], dtype=np.int64).view(np.uint64), np.uint64(42))
        for s in seeds:
            x = _xxh64_long(np.array([s], dtype=np.int64).view(np.uint64), t)
            assert int(x.view(np.int64)[0]) == got[(v, s)], (v, s)


def test_minhash_buckets_signature_matches_expr(spark):
    """The numpy bucket UDF's internal signature must equal
    minhash_signature_expr (signed min of the same hash family):
    verified indirectly — identical docs collide on every band, and the
    full pair pipeline reproduces the exact-jaccard oracle (see
    test_minhash_lsh_equals_exact); here pin the hash family by
    comparing signatures directly for a couple of docs."""
    import numpy as np

    from walker_spark.operators.dedup import (
        _xxh64_long,
        minhash_signature_expr,
        shingle_expr,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "lorem ipsum dolor sit amet")],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id",
        shingle_expr(F.col("text"), 3).alias("sh"),
        minhash_signature_expr(shingle_expr(F.col("text"), 3), 16).alias("sig"),
    ).collect()
    seeds = np.arange(16, dtype=np.uint64)
    for r in rows:
        a = np.asarray(r["sh"], dtype=np.int64).view(np.uint64)[:, None]
        t = _xxh64_long(a, np.uint64(42))
        sig = _xxh64_long(seeds[None, :], t).view(np.int64).min(axis=0)
        assert list(sig) == list(r["sig"]), r["doc_id"]


def test_simhash_udf_matches_expr_lockstep(spark):
    """The vectorized sim_udf path inside simhash_pairs must produce
    bit-identical signatures to the native simhash_expr reference
    (md5-prefix token-hash family, shared with the DuckDB oracle)."""
    import numpy as np
    import pandas as pd

    from walker_spark.operators.dedup import (
        md5_64_expr,
        normalize_text_expr,
        simhash_expr,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "lorem ipsum dolor sit amet consectetur"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    toks = F.filter(
        F.split(normalize_text_expr(F.col("text")), " "), lambda s: s != F.lit("")
    )
    rows = df.select(
        "doc_id",
        F.transform(toks, md5_64_expr).alias("hashes"),
        simhash_expr(F.col("text")).alias("sim_expr"),
    ).collect()
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    for r in rows:
        if r["hashes"] is None:
            assert r["sim_expr"] in (None, ""), r["doc_id"]
            continue
        a = np.asarray(r["hashes"], dtype=np.int64).view(np.uint64)
        if len(a) == 0:
            got = "0" * 64
        else:
            bits = ((a[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            got = "".join("1" if v > 0 else "0" for v in (2 * bits - 1).sum(axis=0))
        assert got == r["sim_expr"], r["doc_id"]


def test_md5_64_expr_matches_hashlib(spark):
    """Property: md5_64_expr == int64 view of the first 8 md5 bytes for
    arbitrary strings — the contract that makes the simhash/fingerprint
    oracles engine-independent (DuckDB reads the same hex prefix)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from walker_spark.operators.dedup import md5_64_expr

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=8))
    def check(texts):
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        got = [r["h"] for r in df.select(md5_64_expr(F.col("t")).alias("h")).collect()]
        want = [
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big", signed=True)
            for t in texts
        ]
        assert got == want

    check()


def test_hamming_expr_matches_popcount(spark):
    """hamming_expr (the interpreted reference form) must agree with the
    production bit_count(xor)-on-packed-longs verify."""
    from walker_spark.operators.dedup import hamming_expr

    rows = [("1010" * 16, "1110" * 16), ("0" * 64, "1" * 64), ("01" * 32, "01" * 32)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        hamming_expr(F.col("a"), F.col("b")).alias("h"),
        F.bit_count(
            F.conv(F.col("a"), 2, -10).cast("long").bitwiseXOR(
                F.conv(F.col("b"), 2, -10).cast("long")
            )
        ).alias("p"),
    ).collect()
    for r in got:
        assert r["h"] == r["p"]
    assert [r["h"] for r in got] == [16, 64, 0]


def test_simhash_bucket_cap_semantics(spark):
    """The production ``max_bucket`` cap must keep exactly the
    ``row_number() OVER (band, bucket ORDER BY id) <= cap`` members —
    the contract the dedup_simhash DuckDB oracle now replicates in SQL
    (VERDICT r4 #3). A 30-identical-doc family collapses every band to
    one bucket: cap=10 must keep pairs among the 10 SMALLEST ids only
    (id-ordered window), while the lossless path keeps all C(30,2)."""
    from walker_spark.operators.dedup import simhash_pairs

    rows = [(i, "same boilerplate page text repeated verbatim") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, max_hamming=8, max_bucket=10).collect()
    }
    lossless = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, max_hamming=8, max_bucket=None).collect()
    }
    assert lossless == {(a, b) for a in range(30) for b in range(30) if a < b}
    assert capped == {(a, b) for a in range(10) for b in range(10) if a < b}
    assert capped < lossless


def test_connected_components_star_matches_label(spark):
    """The O(log n) large-star/small-star contraction (VERDICT r4 #6)
    must agree with the label-propagation fixpoint on the adversarial
    shapes: a long chain (diameter = n, the case label propagation
    can't afford), a star, a clique, and a two-component mix — and
    converge within 2*log2(n) rounds on the chain."""
    import math

    from walker_spark.operators.dedup import connected_components

    # shallow shapes: star path vs the label-propagation fixpoint
    # (label is cheap here — diameter <= 2)
    cases = {
        "star64": [(0, i) for i in range(1, 64)],
        "clique16": [(a, b) for a in range(16) for b in range(a + 1, 16)],
        "two_comps": [(i, 100 + i) for i in range(20)]
        + [(100 + i, 200) for i in range(20)]
        + [(500 + i, 700) for i in range(25)],
    }
    for name, edges in cases.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        stats: dict = {}
        star = {
            (r["id"], r["component"])
            for r in connected_components(df, algorithm="star", stats=stats).collect()
        }
        label = {
            (r["id"], r["component"])
            for r in connected_components(df, algorithm="label").collect()
        }
        assert star == label, name
        assert stats["rounds"] <= 2 * math.log2(len(star)) + 1, (name, stats)
    # the diameter case label propagation can't afford: a 256-node
    # chain entered in scrambled id order — ground truth is known
    # (one component rooted at 0), so no 256-round label run needed
    n = 256
    perm = [(i * 97) % n for i in range(n)]  # 97 coprime to 256
    chain = [(perm[i], perm[i + 1]) for i in range(n - 1)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    stats = {}
    star = {
        (r["id"], r["component"])
        for r in connected_components(df, algorithm="star", stats=stats).collect()
    }
    assert star == {(i, 0) for i in range(n)}
    assert stats["rounds"] <= 2 * math.log2(n) + 1, stats


def test_keep_one_per_cluster(spark):
    """Survivor selection over a hand-built component map: exactly one
    survivor per cluster (the min id), every singleton kept, and
    cluster_size = member count (1 for singletons)."""
    from walker_spark.operators.dedup import keep_one_per_cluster

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    comp = spark.createDataFrame(
        # clusters {0,1,2} and {5,6}; 3,4,7 unclustered singletons
        [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)], "id long, component long"
    )
    surv = keep_one_per_cluster(docs, comp).collect()
    got = {r["doc_id"]: r["cluster_size"] for r in surv}
    assert got == {0: 3, 3: 1, 4: 1, 5: 2, 7: 1}
    # survivors keep the docs-side payload columns
    assert {r["text"] for r in surv} == {"doc 0", "doc 3", "doc 4", "doc 5", "doc 7"}


def test_train_filter_gates(spark):
    """Each C4-style gate binds independently and `kept` is their
    conjunction."""
    from walker_spark.functions.text import train_filter

    rows = [
        (0, "a clean english document with plenty of ordinary words here", "en"),
        (1, "too short", "en"),                           # drop_len (2 tokens)
        (2, "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((()))", "en"),  # drop_punct
        (3, "12345 67890 11111 22222 33333 44444 55555", "en"),   # drop_digit
        (4, "ein sauberes englisches dokument mit vielen worten hier drin", "zz"),  # drop_lang
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in train_filter(df, allowed_langs=("en",)).collect()
    }
    assert out[0]["kept"] and not any(
        out[0][c] for c in ("drop_len", "drop_punct", "drop_digit", "drop_lang")
    )
    assert out[1]["drop_len"] and not out[1]["kept"]
    assert out[2]["drop_punct"] and not out[2]["kept"]
    assert out[3]["drop_digit"] and not out[3]["kept"]
    assert out[4]["drop_lang"] and not out[4]["kept"]
    # no language gate configured -> drop_lang never binds
    nolang = train_filter(df).collect()
    assert not any(r["drop_lang"] for r in nolang)


def test_corpus_quality_rollup(spark):
    from walker_spark.functions.text import corpus_quality_rollup

    rows = [
        (0, "good text with several plain words inside it", "en", "a.com"),
        (1, "another decent document with readable content here", "en", "a.com"),
        (2, "!!! ??? ;;; ### $$$ %%%", "en", "b.com"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["source"]: r for r in corpus_quality_rollup(df).collect()}
    assert out["a.com"]["n_docs"] == 2 and out["b.com"]["n_docs"] == 1
    assert out["a.com"]["total_tokens"] == 15
    assert out["a.com"]["avg_quality"] > out["b.com"]["avg_quality"]


def test_stratified_sample(spark):
    """Hash-ranked sampling: exact per-stratum quota, deterministic
    across runs, and stable under repartitioning (the property RNG
    sampling lacks)."""
    from walker_spark.functions.text import stratified_sample

    docs = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 3}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    a = stratified_sample(docs, strata_cols=("source",), k=4).collect()
    assert len(a) == 12
    per = {}
    for r in a:
        per.setdefault(r["source"], []).append((r["sample_rank"], r["doc_id"]))
    assert all(sorted(v)[0][0] == 1 and len(v) == 4 for v in per.values())
    b = stratified_sample(docs.repartition(7), strata_cols=("source",), k=4).collect()
    assert {(r["source"], r["doc_id"], r["sample_rank"]) for r in a} == {
        (r["source"], r["doc_id"], r["sample_rank"]) for r in b
    }


def test_top_ngrams(spark):
    from walker_spark.functions.text import top_ngrams

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c"),      # "a b c" x2, "b c a" x1, "c a b" x1
            (1, "a b c d"),          # "a b c" x1, "b c d" x1
            (2, "too short"),        # < 3 tokens: contributes nothing
        ],
        "doc_id long, text string",
    )
    got = [(r["ngram"], r["n_occurrences"]) for r in top_ngrams(docs, n=3, k=3).collect()]
    assert got == [("a b c", 3), ("b c a", 1), ("b c d", 1)]


def test_repetition_metrics(spark):
    from walker_spark.functions.text import repetition_metrics

    docs = spark.createDataFrame(
        [
            (0, "aa bb\naa bb\ncc dd"),  # dup line, dominant 2-gram
            (1, "x y z"),                # one line, no repeats
            (2, ""),                     # empty doc: all-zero metrics
            (3, "p q p q p q"),          # dup 3-grams ("p q p" x2, "q p q" x2)
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}

    r0 = rows[0]
    assert r0["n_lines"] == 3
    assert r0["dup_line_frac"] == round(1 - 2 / 3, 4)
    # "aa bb" twice = 10 chars of 15 line chars
    assert r0["dup_line_char_frac"] == round(10 / 15, 4)
    # top 2-gram "aa bb" (2 occurrences x 5 chars) over len 17
    assert r0["top_ngram_char_frac"] == round(10 / 17, 4)
    assert r0["dup_ngram_char_frac"] == 0.0  # all 3-grams distinct

    r1 = rows[1]
    assert (r1["n_lines"], r1["dup_line_frac"], r1["dup_line_char_frac"]) == (1, 0.0, 0.0)

    r2 = rows[2]
    assert (r2["n_lines"], r2["top_ngram_char_frac"], r2["dup_ngram_char_frac"]) == (0, 0.0, 0.0)

    r3 = rows[3]
    # 3-grams: "p q p" x2 + "q p q" x2 -> 4*5=20 chars over len 11, capped at 1
    assert r3["dup_ngram_char_frac"] == 1.0
    # top 2-gram "p q" x3 (5 windows: p q, q p, p q, q p, p q) x 3 chars / 11
    assert r3["top_ngram_char_frac"] == round(9 / 11, 4)


def test_decontaminate(spark):
    from walker_spark.functions.text import decontaminate

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "unrelated words about spark shuffles and joins"),
            (2, "quick brown fox jumps high"),  # shares one 3-gram with bench
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox leaps")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=3).collect()}
    # doc 0 shares "the quick brown" and "quick brown fox"
    assert out[0]["contaminated"] and out[0]["n_contaminated_grams"] == 2
    assert not out[1]["contaminated"] and out[1]["n_contaminated_grams"] == 0
    assert out[2]["contaminated"] and out[2]["n_contaminated_grams"] == 1
    # corpus columns survive annotation
    assert "text" in out[0].asDict()


def test_pii_scrub(spark):
    from walker_spark.functions.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@example.co.uk then call +1 (555) 010-7788 via 192.168.0.17 ok"),
            (1, "no pii here at all"),
            (2, "two mails a@b.io c@d.org and bare 10.0.0.7"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}

    r0 = rows[0]
    assert (r0["n_email"], r0["n_ipv4"], r0["n_phone"]) == (1, 1, 1)
    assert r0["text_scrubbed"] == "mail <EMAIL> then call <PHONE> via <IP> ok"

    r1 = rows[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (0, 0, 0)
    assert r1["text_scrubbed"] == r1["text"]

    r2 = rows[2]
    # ipv4 is scrubbed before the phone pattern can see the dotted quad
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (2, 1, 0)
    assert r2["text_scrubbed"] == "two mails <EMAIL> <EMAIL> and bare <IP>"


def test_cross_doc_span_stats(spark):
    """Hand-computable fixture: shared 2-grams across docs, interval
    UNION (overlapping windows count once; disjoint runs both count)."""
    from walker_spark.functions.text import cross_doc_span_stats

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),    # shares "a b","b c" -> union [0,3) = 3 of 5
            (1, "a b c x y"),    # same head -> 3 of 5
            (2, "p q r s t"),    # all grams unique
            (3, "a b z a b"),    # "a b" at pos 0 AND 3 -> [0,2)+[3,5) = 4 of 5
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cross_doc_span_stats(docs, n=2).collect()}
    assert out[0]["n_grams"] == 4 and out[0]["n_dup_grams"] == 2
    assert abs(out[0]["dup_token_frac"] - 3 / 5) < 1e-12
    assert abs(out[1]["dup_token_frac"] - 3 / 5) < 1e-12
    assert out[2]["n_dup_grams"] == 0 and out[2]["dup_token_frac"] == 0.0
    assert out[3]["n_dup_grams"] == 2
    assert abs(out[3]["dup_token_frac"] - 4 / 5) < 1e-12
    # min_docs=3: only "a b" (docs 0,1,3) stays duplicated; "b c" (0,1) drops
    out3 = {r["doc_id"]: r for r in cross_doc_span_stats(docs, n=2, min_docs=3).collect()}
    assert out3[0]["n_dup_grams"] == 1
    assert abs(out3[0]["dup_token_frac"] - 2 / 5) < 1e-12


def test_pack_sequences_concat(spark):
    """Concat-mode packing: contiguous shard streams, correct bin spans,
    invariant under input repartitioning."""
    from walker_spark.functions.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 40))) for i in range(200)] + [(200, "")],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, ctx=64, n_shards=4, mode="concat").collect()
    assert len(out) == 201
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        off = 0
        for r in rows:
            assert r["start_offset"] == off
            if r["n_tokens"] > 0:
                assert r["first_bin"] == off // 64
                assert r["last_bin"] == (off + r["n_tokens"] - 1) // 64
                assert r["n_bins_spanned"] == r["last_bin"] - r["first_bin"] + 1
            else:
                assert r["n_bins_spanned"] == 0 and r["first_bin"] is None
            off += r["n_tokens"]
    again = pack_sequences(docs.repartition(7), ctx=64, n_shards=4, mode="concat").collect()
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(out) == key(again)


def test_pack_sequences_greedy(spark):
    """Greedy mode: a doc never splits; bin capacity holds except for
    flagged overflow docs, which sit alone in their bin."""
    from walker_spark.functions.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * t)) for i, t in enumerate([30, 40, 50, 70, 10, 90, 5, 64, 1])],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, ctx=64, n_shards=1, mode="greedy").collect()
    bins = {}
    for r in out:
        assert r["first_bin"] == r["last_bin"]
        assert r["overflow"] == (r["n_tokens"] > 64)
        bins.setdefault(r["first_bin"], []).append(r)
    for b, rows in bins.items():
        total = sum(r["n_tokens"] for r in rows)
        if any(r["overflow"] for r in rows):
            assert len(rows) == 1  # overflow doc owns its bin
        else:
            assert total <= 64
        # offsets within the bin are contiguous in id order
        off = 0
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            assert r["start_offset"] == off
            off += r["n_tokens"]
    assert sorted(bins) == list(range(len(bins)))  # bins are contiguous


def test_mixture_weights_resample(spark):
    """Temperature mixing: exact rational rates (epochs + rem/den ==
    T*w_i / (Σw*tok_i)), per-doc copies in {epochs, epochs+1},
    deterministic under repartitioning, and the realized token count
    tracks the target."""
    from walker_spark.functions.text import mixture_weights, mixture_resample

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + (i * 7) % 60)), f"s{i % 4}") for i in range(400)],
        "doc_id long, text string, source string",
    )
    w = mixture_weights(docs, target_tokens=None)
    rows = w.collect()
    wsum = sum(r["weight_num"] for r in rows)
    tsum = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert r["weight_den"] == wsum
        num, den = tsum * r["weight_num"], wsum * r["n_tokens"]
        assert r["epochs"] == num // den and r["rem_num"] == num % den
        assert r["rem_den"] == den
    r1 = mixture_resample(docs, w).collect()
    per_epoch = {r["source"]: r["epochs"] for r in rows}
    for r in r1:
        assert r["n_copies"] in (per_epoch[r["source"]], per_epoch[r["source"]] + 1)
    r2 = mixture_resample(docs.repartition(5), w).collect()
    assert {(r["doc_id"], r["n_copies"]) for r in r1} == {
        (r["doc_id"], r["n_copies"]) for r in r2
    }
    # doubling the budget: realized tokens within 10% of 2*total
    w2 = mixture_weights(docs, target_tokens=2 * tsum)
    got = mixture_resample(docs, w2, explode=True)
    from walker_spark.functions.text import token_count_expr
    import pyspark.sql.functions as F

    realized = got.agg(F.sum(token_count_expr(F.col("text")))).collect()[0][0]
    assert abs(realized - 2 * tsum) / (2 * tsum) < 0.10


def test_pack_examples_stream_fidelity(spark):
    """Materialized bins reconstruct each shard's concatenated token
    stream exactly (order restored by position through the shuffle)."""
    from walker_spark.functions.text import pack_examples

    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(3 + i % 7))) for i in range(80)],
        "doc_id long, text string",
    )
    ex = pack_examples(docs, ctx=16, n_shards=3).collect()
    per_shard = {}
    for r in sorted(ex, key=lambda r: (r["shard"], r["bin"])):
        per_shard.setdefault(r["shard"], []).extend(r["tokens"])
        assert len(r["tokens"]) == r["n_tokens"]
    # expected stream: docs of this shard sorted by id, tokens in order
    from walker_spark.functions.text import pack_sequences

    packed = pack_sequences(docs, ctx=16, n_shards=3).collect()
    shard_of = {r["doc_id"]: r["shard"] for r in packed}
    want = {}
    for r in sorted(docs.collect(), key=lambda r: r["doc_id"]):
        want.setdefault(shard_of[r["doc_id"]], []).extend(r["text"].split())
    assert per_shard == want
    # every bin but each shard's last is exactly full
    for s, rows in {
        s: sorted((r for r in ex if r["shard"] == s), key=lambda r: r["bin"])
        for s in {r["shard"] for r in ex}
    }.items():
        assert all(r["n_tokens"] == 16 for r in rows[:-1])
        assert [r["bin"] for r in rows] == list(range(len(rows)))


def test_vocab_encode(spark):
    """Vocabulary ranking (count desc, token asc) and order-preserving
    integer encoding with OOV fraction."""
    from walker_spark.functions.text import build_vocab, encode_tokens

    docs = spark.createDataFrame(
        [
            (0, "b a a c b a"),     # a:3 b:2(+1 below) c:1
            (1, "b z"),             # z:1 (rare, beyond vocab size)
            (2, ""),
        ],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, size=3)
    got = {r["token"]: (r["token_id"], r["n_occurrences"]) for r in vocab.collect()}
    # counts: a=3, b=3, c=1, z=1 → ranks: a(1) b(2) by tie-break, c(3)
    assert got == {"a": (1, 3), "b": (2, 3), "c": (3, 1)}

    enc = {r["doc_id"]: r for r in encode_tokens(docs, vocab).collect()}
    assert enc[0]["token_ids"] == [2, 1, 1, 3, 2, 1]
    assert enc[0]["oov_frac"] == 0.0
    assert enc[1]["token_ids"] == [2, 0]          # z → OOV id 0
    assert abs(enc[1]["oov_frac"] - 0.5) < 1e-12
    assert enc[2]["token_ids"] == [] and enc[2]["oov_frac"] == 0.0
    # determinism under repartitioning
    again = {r["doc_id"]: r["token_ids"] for r in
             encode_tokens(docs.repartition(4), vocab).collect()}
    assert again == {i: r["token_ids"] for i, r in enc.items()}


def test_pq_shortlist_recall_and_determinism(spark):
    """Flat PQ-ADC: the top-50 shortlist holds most of the exact top-10
    (re-rank composes downstream), and the quantized k-medians training
    makes results invariant to input partitioning."""
    import pyspark.sql.functions as F

    from walker_spark.operators.similarity import cosine_topk, pq_cosine_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(e, q, k=10).collect()
    }
    short = pq_cosine_topk(e, q, k=50, m=8, ks=64, train_iters=1).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in short}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall
    # scores are valid cosines of unit vectors; ranks well-formed
    assert all(-1.0001 <= r["approx_score"] <= 1.0001 for r in short)
    per_q = {}
    for r in short:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 51)) for v in per_q.values())
    # deterministic under repartitioning (training included)
    again = pq_cosine_topk(e.repartition(7), q, k=50, m=8, ks=64, train_iters=1).collect()
    assert {(r["query_id"], r["neighbor_id"], r["approx_score"], r["rank"]) for r in short} == {
        (r["query_id"], r["neighbor_id"], r["approx_score"], r["rank"]) for r in again
    }


def test_remove_boilerplate(spark):
    from walker_spark.functions.text import remove_boilerplate

    nav, foot = "nav menu home", "footer legal"
    docs = spark.createDataFrame(
        [
            (0, "h1", f"{nav}\nunique alpha\n{foot}"),
            (1, "h1", f"{nav}\nunique beta\n\n{foot}"),
            (2, "h1", f"{nav}\nunique gamma"),
            (3, "h1", "all original content here"),
            # second group: too few docs -> nothing stripped even though
            # the line is in 100% of them
            (4, "h2", "shared line"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(docs, min_docs=2, doc_frac=0.5).collect()
    }
    # nav in 3/4 (75%) and footer in 2/4 (50%) of group h1 -> stripped
    assert out[0]["clean_text"] == "unique alpha"
    assert out[0]["n_lines"] == 3 and out[0]["n_removed"] == 2
    # empty line neither counted nor reassembled
    assert out[1]["clean_text"] == "unique beta" and out[1]["n_lines"] == 3
    assert out[2]["clean_text"] == "unique gamma"
    assert out[3]["n_removed"] == 0 and out[3]["clean_text"] == docs.collect()[3]["text"]
    # min_docs guard: single-doc group untouched
    assert out[4]["n_removed"] == 0 and out[4]["clean_text"] == "shared line"
    assert out[0]["removed_frac"] == 0.6667


def test_remove_boilerplate_order_preserved(spark):
    from walker_spark.functions.text import remove_boilerplate

    boiler = "BOILER"

    def doc_lines(d):
        return [f"d{d}-line-{i:03d}" for i in range(40)]

    docs = spark.createDataFrame(
        [
            (
                d,
                "g",
                "\n".join(
                    [boiler] + doc_lines(d)[:20] + [boiler] + doc_lines(d)[20:]
                ),
            )
            for d in range(3)
        ],
        "doc_id long, source string, text string",
    )
    out = remove_boilerplate(docs, min_docs=2, doc_frac=0.9).collect()
    assert len(out) == 3
    for r in out:
        # both BOILER occurrences stripped, 40 unique lines kept in order
        assert r["clean_text"] == "\n".join(doc_lines(r["doc_id"]))
        assert r["n_removed"] == 2 and r["n_lines"] == 42


def test_charlm_metrics(spark):
    import math

    from walker_spark.functions.text import charlm_metrics

    train = spark.createDataFrame(
        [(0, "ababab"), (1, "ababab")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "abab"), (11, "zzzz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in charlm_metrics(score, train=train).collect()}
    # model: trigrams aba x4, bab x4; contexts ab x6 (4 aba + 2 abX end?) ->
    # recompute: each 'ababab' has grams aba, bab, aba, bab; ctx ab,ba,ab,ba
    # counts over 2 docs: aba=4, bab=4; ab=4, ba=4; V = {a,b} = 2
    V = 2.0

    def nll(gc, cc):
        x = -math.log((gc + 1.0) / (cc + 1.0 * V))
        return math.floor(x * 1e6 + 0.5) / 1e6

    # doc 10 'abab': grams aba (gc=4, ctx ab cc=4), bab (gc=4, ctx ba cc=4)
    exp_avg = round((nll(4, 4) + nll(4, 4)) / 2, 6)
    assert out[10]["n_grams"] == 2
    assert out[10]["avg_nll"] == exp_avg
    # doc 11 'zzzz': gram zzz unseen, ctx zz unseen -> p = 1/(0 + V)
    exp_unseen = round(nll(0, 0), 6)
    assert out[11]["avg_nll"] == exp_unseen
    # the in-distribution doc scores strictly better
    assert out[10]["avg_nll"] < out[11]["avg_nll"]
    assert out[10]["ppl"] < out[11]["ppl"]
    # ppl = exp(avg_nll) on the rounded mean
    assert abs(out[11]["ppl"] - round(math.exp(exp_unseen), 6)) < 2e-6


def test_charlm_partitioning_invariant(spark):
    from walker_spark.functions.text import charlm_metrics

    docs = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text sample "), (F.col("id") % 7).cast("string")).alias("text"),
    )
    a = charlm_metrics(docs).collect()
    b = charlm_metrics(docs.repartition(11)).collect()
    assert {(r["doc_id"], r["avg_nll"], r["ppl"]) for r in a} == {
        (r["doc_id"], r["avg_nll"], r["ppl"]) for r in b
    }


def test_script_metrics(spark):
    from walker_spark.functions.text import script_metrics

    docs = spark.createDataFrame(
        [
            (0, "hello world"),
            (1, "привет мир ok"),       # cyrillic dominates, latin stub
            (2, "漢字 abc 漢字漢字"),     # han dominates
            (3, "12345 !!!"),            # no scripted letters
            (4, "abcαβγ"),               # tie 3-3 -> lexicographic: greek
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in script_metrics(docs).collect()}
    assert out[0]["dominant_script"] == "latin" and out[0]["dominant_frac"] == 1.0
    assert out[1]["dominant_script"] == "cyrillic" and out[1]["n_latin"] == 2
    assert out[2]["dominant_script"] == "han" and out[2]["n_han"] == 6
    assert out[3]["dominant_script"] == "none" and out[3]["dominant_frac"] == 0.0
    assert out[3]["n_scripted"] == 0
    # exact tie: strict-> keeps the lexicographically FIRST name seen
    assert out[4]["n_latin"] == 3 and out[4]["n_greek"] == 3
    assert out[4]["dominant_script"] == "greek"
    assert out[4]["dominant_frac"] == 0.5


def test_percentile_cut(spark):
    from walker_spark.functions.text import percentile_cut

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "doc_id long, score double"
    )
    out = percentile_cut(df, "score", q=0.25).collect()
    thr = out[0]["threshold"]
    # exact interpolated p25 of 1..100 = 25.75
    assert thr == 25.75
    kept = {r["doc_id"] for r in out if r["keep"]}
    assert kept == set(range(26, 101))

    # keep_below flips the gate; strictness drops threshold ties
    low = {r["doc_id"] for r in percentile_cut(df, "score", q=0.5, keep_above=False).collect() if r["keep"]}
    assert low == set(range(1, 51))  # p50 = 50.5, strictly below

    ties = spark.createDataFrame([(i, 5.0) for i in range(10)], "doc_id long, score double")
    t_out = percentile_cut(ties, "score", q=0.25).collect()
    assert all(not r["keep"] for r in t_out) and t_out[0]["threshold"] == 5.0


def test_line_quality_filter(spark):
    from walker_spark.functions.text import line_quality_filter

    docs = spark.createDataFrame(
        [
            (0, "A good sentence stays here.\nok\nNo terminal punct line\n"
                "SHOUTING HEADER LINE.\n- bullet point here.\n\n"
                'Quoted line stays."'),
            (1, "x\ny\nz"),  # everything short
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_quality_filter(docs).collect()}
    r0 = out[0]
    assert r0["n_lines"] == 6  # empty line not counted
    assert (r0["n_short"], r0["n_punct"], r0["n_caps"], r0["n_bullet"]) == (1, 1, 1, 1)
    assert r0["clean_text"] == 'A good sentence stays here.\nQuoted line stays."'
    r1 = out[1]
    assert r1["n_short"] == 3 and r1["clean_text"] == ""

    # rule toggles: punctuation requirement off
    lax = {r["doc_id"]: r for r in line_quality_filter(docs, require_terminal_punct=False).collect()}
    assert lax[0]["n_punct"] == 0
    assert "No terminal punct line" in lax[0]["clean_text"]


def test_quantize_embeddings(spark):
    import math

    from walker_spark.operators.similarity import quantize_embeddings

    vecs = spark.createDataFrame(
        [
            (0, [1.0, -0.5, 0.25, 0.0]),
            (1, [0.0, 0.0, 0.0, 0.0]),       # zero vector
            (2, [-2.0, 2.0, 1.0, -1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(vecs).collect()}
    r0 = out[0]
    assert r0["scale"] == 1.0
    # half-away: -0.5*127 = -63.5 -> -64
    assert r0["codes"] == [127, -64, 32, 0]
    assert r0["max_abs_err"] <= 0.5 / 127 + 1e-9
    assert out[1]["codes"] == [0, 0, 0, 0] and out[1]["scale"] == 0.0
    assert out[1]["max_abs_err"] == 0.0
    assert out[2]["codes"] == [-127, 127, 64, -64]
    # reconstruction bound: |err| <= scale/254 + quantize jitter
    for r in out.values():
        if r["scale"] > 0:
            assert r["max_abs_err"] <= r["scale"] / 254 + 1e-9


def test_power_iteration_pc1(spark):
    import numpy as np

    from walker_spark.operators.decomp import power_iteration_pc1

    rng = np.random.default_rng(3)
    # strong planted direction + noise
    u = rng.standard_normal(32)
    u /= np.linalg.norm(u)
    X = np.outer(rng.standard_normal(200) * 5.0, u) + 0.1 * rng.standard_normal((200, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    out = power_iteration_pc1(df, iterations=6).orderBy("vec_id").collect()
    got = np.array([r["pc1"] for r in out])

    Xd = np.array([[np.float32(x) for x in X[i]] for i in range(200)], dtype=np.float64)
    _, s, vt = np.linalg.svd(Xd, full_matrices=False)
    ref = Xd @ vt[0]
    corr = abs(np.corrcoef(got, ref)[0, 1])
    assert corr > 0.999, corr
    # dominant eigenvalue of X^T X ~ s[0]^2 under the iteration scaling
    assert out[0]["eigenvalue"] > 0

    # bit-exact under repartitioning (integer-grid trajectory)
    again = power_iteration_pc1(df.repartition(9), iterations=6).orderBy("vec_id").collect()
    assert [(r["vec_id"], r["pc1"], r["eigenvalue"]) for r in again] == [
        (r["vec_id"], r["pc1"], r["eigenvalue"]) for r in out
    ]


def test_bigram_lm_metrics(spark):
    import math

    from walker_spark.functions.text import bigram_lm_metrics

    train = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b c a b")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b c"), (11, "c c"), (12, "a zz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_metrics(score, train=train, alpha=0.4).collect()}
    # train bigrams: a->b x4, b->a x1, b->c x2, c->a x1; ctx a=4,b=3,c=1
    # unigrams: a=4, b=4, c=2; N=10
    q = lambda s: math.floor(-math.log(s) * 1e6 + 0.5)

    r10 = out[10]  # (a,b): 4/4 ; (b,c): 2/3
    exp = round((q(4 / 4) + q(2 / 3)) / 2e6, 6)
    assert r10["n_bigrams"] == 2 and r10["n_backoff"] == 0
    assert r10["avg_nll"] == exp
    r11 = out[11]  # (c,c): unseen bigram, c unigram seen -> 0.4*2/10
    assert r11["n_backoff"] == 1
    assert r11["avg_nll"] == round(q(0.4 * 2 / 10) / 1e6, 6)
    r12 = out[12]  # (a,zz): zz OOV -> floor 0.4/10
    assert r12["n_backoff"] == 1
    assert r12["avg_nll"] == round(q(0.4 / 10) / 1e6, 6)


def test_normalize_unicode(spark):
    import unicodedata

    from walker_spark.functions.text import normalize_unicode

    decomposed = "café"
    docs = spark.createDataFrame(
        [
            (0, decomposed),                 # NFC composes to café
            (1, "tab\tand\nnewline stay"),   # \t single, \n preserved
            (2, "ctl\x07here\x00too"),
            (3, "  lots   of   space  "),
            (4, "already clean"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_unicode(docs).collect()}
    assert out[0]["text_norm"] == unicodedata.normalize("NFC", decomposed)
    assert out[0]["text_norm"] != decomposed and out[0]["changed"]
    assert out[1]["text_norm"] == "tab\tand\nnewline stay"
    assert not out[1]["changed"] and out[1]["n_ctrl"] == 0
    assert out[2]["text_norm"] == "ctlheretoo" and out[2]["n_ctrl"] == 2
    assert out[3]["text_norm"] == "lots of space"
    assert not out[4]["changed"]


def test_winnow_fingerprints(spark):
    from walker_spark.functions.text import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog and keeps running on"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, "PREFIX " + base),     # shifted copy
            (2, "completely different content with other words entirely"),
            (3, "abc"),                # shorter than k -> zero grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in winnow_fingerprints(docs, k=5, w=4).collect()}
    # density near the theoretical 2/(w+1) = 0.4 (boundaries inflate it)
    assert 0.25 < out[0]["density"] < 0.6
    assert out[3]["n_grams"] == 0 and out[3]["n_selected"] == 0
    # digest is position-sensitive: shifted copy differs
    assert out[0]["digest"] != out[1]["digest"]
    assert out[0]["digest"] != out[2]["digest"]
    # determinism under repartitioning
    again = {r["doc_id"]: r["digest"] for r in winnow_fingerprints(
        docs.repartition(3), k=5, w=4).collect()}
    assert all(again[d] == out[d]["digest"] for d in out)


def test_containment_pairs(spark):
    from walker_spark.operators.dedup import containment_pairs

    long_doc = " ".join(f"tok{i}" for i in range(40))
    excerpt = " ".join(f"tok{i}" for i in range(10, 22))  # 12-token quote
    docs = spark.createDataFrame(
        [
            (1, long_doc),
            (2, excerpt),
            (3, " ".join(f"other{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r for r in containment_pairs(docs, n=8, threshold=0.5).collect()}
    pair = out[(1, 2)]
    # all 5 of the excerpt's 8-grams live inside the long doc
    assert pair["containment"] == 1.0 and pair["cont_b"] == 1.0
    # directionally: only 5 of the long doc's 33 grams are shared
    assert pair["cont_a"] == round(5 / 33, 4)
    assert pair["n_shared"] == 5
    assert (1, 3) not in out and (2, 3) not in out

    # jaccard would be far below the containment signal
    from walker_spark.operators.dedup import ngram_jaccard_pairs
    j = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in ngram_jaccard_pairs(docs, n=8, threshold=0.0).collect()}
    assert j.get((1, 2), 0.0) < 0.2


def test_vocab_stats(spark):
    from walker_spark.functions.text import vocab_stats

    docs = spark.createDataFrame(
        [
            (0, "a", "x y x y unique1"),
            (1, "a", "x y z unique2"),
            (2, "b", "w w w w"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in vocab_stats(docs).collect()}
    a = out["a"]
    # source a: tokens x*3 y*3 z*1 unique1 unique2 -> 9 tokens, 5 types, 3 hapax
    assert (a["n_tokens"], a["n_types"], a["n_hapax"]) == (9, 5, 3)
    assert a["ttr"] == round(5 / 9 + 1e-12, 4) or abs(a["ttr"] - 0.5556) < 1e-9
    assert abs(a["hapax_frac"] - 0.6) < 1e-9
    b = out["b"]
    assert (b["n_tokens"], b["n_types"], b["n_hapax"]) == (4, 1, 0)
    assert b["ttr"] == 0.25 and b["hapax_frac"] == 0.0


def test_spread_map_side_gating(spark):
    """The r6 map-side spread fires only when the source has fewer
    partitions than the session's parallelism, and never changes rows."""
    from walker_spark.operators.dedup import _spread_map_side

    target = spark.sparkContext.defaultParallelism
    small = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "id long, text string"
    ).coalesce(1)
    spread = _spread_map_side(small)
    assert spread.rdd.getNumPartitions() == target
    assert sorted(r["id"] for r in spread.collect()) == list(range(10))

    wide = small.repartition(target + 3)
    assert _spread_map_side(wide) is wide  # no-op above the threshold


def test_shingle_hashes_udf_jaccard_matches_expr(spark):
    """The vectorized verify shingles (blake2b family) must induce the
    SAME pairwise Jaccard as the native shingle_expr (xxhash64 family):
    hashes are a set-equality proxy for the window strings, so any
    jaccard difference would be a normalization/window-rule divergence
    (or a collision) and would break the minhash oracle."""
    from walker_spark.operators.dedup import shingle_expr, shingle_hashes_udf

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "Punctuation, splitting; and   WHITESPACE\tcollapse rules!",
        "punctuation splitting and whitespace collapse rules",
        "short doc",  # below the window size: whole-text fallback
        "",  # empty after normalization
        "ünïcode Text With MIXED case und Straße tokens",
        "ünïcode text with mixed case und straße tokens",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    native = {
        r["id"]: set(r["sh"])
        for r in df.select("id", shingle_expr(F.col("text"), 3).alias("sh")).collect()
    }
    udf = {
        r["id"]: set(r["sh"])
        for r in df.select(
            "id", shingle_hashes_udf(3)(F.col("text")).alias("sh")
        ).collect()
    }
    assert set(native) == set(udf)
    for i in native:
        # identical set cardinality per doc...
        assert len(native[i]) == len(udf[i]), f"doc {i} window-set size differs"
    for i in native:
        for j in native:
            if i >= j:
                continue
            jn = len(native[i] & native[j]) / max(1, len(native[i] | native[j]))
            ju = len(udf[i] & udf[j]) / max(1, len(udf[i] | udf[j]))
            assert abs(jn - ju) < 1e-12, f"jaccard({i},{j}) {jn} != {ju}"
