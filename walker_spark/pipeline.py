"""The end-to-end corpus curation pipeline — the one-call user story
that composes the individual gates this package provides:

    raw documents
      → C4-style prefilter        (functions/text.py::train_filter)
      → exact dedup               (128-bit md5 of normalized text,
                                   min-id survivor — operators/dedup.py
                                   semantics, inlined here so the stage
                                   can attribute drops)
      → per-host/source cap       (functions/text.py::stratified_sample)
      → curated corpus + per-stage attribution

Each document exits with a ``drop_stage`` ('' for survivors), so the
output is simultaneously the curated corpus AND the audit trail — at
100 TB you never want to re-run the pipeline just to learn why a
document disappeared.

Plan shape: the prefilter is a projection (zero shuffle); exact dedup
is one hash exchange on the 128-bit text hash (ids+hash only — the
min-id winner comes from a map-side-combined ``min``); the cap is one
window exchange on the stratum with Catalyst's WindowGroupLimit
map-side top-k; the final attribution join is ids-only. The corpus
text crosses at most ONE exchange end to end (the dedup groupBy),
which is the floor for global dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["curate_corpus", "corpus_diff", "recrawl_schedule", "split_corpus"]


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    strata_col: str = "source",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.2,
    max_digit_ratio: float = 0.3,
    cap_per_stratum: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Returns the input plus ``drop_stage`` ∈ {'', 'filter:<cause>',
    'dedup', 'cap'} and ``kept`` — evaluated in pipeline order, so a
    document failing the prefilter is never charged to dedup, and the
    cap ranks only docs that survived both earlier gates."""
    from .functions.text import stratified_sample, train_filter
    from .operators.dedup import normalize_text_expr

    # stage 1: prefilter with first-gate cause attribution
    annotated = train_filter(
        df,
        text_col=text_col,
        lang_col=lang_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_punct_ratio=max_punct_ratio,
        max_digit_ratio=max_digit_ratio,
    )
    cause = (
        F.when(F.col("drop_len"), F.lit("len"))
        .when(F.col("drop_punct"), F.lit("punct"))
        .when(F.col("drop_digit"), F.lit("digit"))
        .when(F.col("drop_lang"), F.lit("lang"))
        .otherwise(F.lit(""))
    )
    filtered = annotated.withColumn("drop_cause", cause).drop(
        "drop_len", "drop_punct", "drop_digit", "drop_lang", "kept"
    )
    # stage 2: exact dedup among filter-passers — min id per 128-bit
    # hash wins (ids+hash only through the exchange)
    hashed = filtered.withColumn(
        "__th", F.md5(normalize_text_expr(F.col(text_col)))
    )
    winners = (
        hashed.filter(F.col("drop_cause") == "")
        .groupBy("__th")
        .agg(F.min(id_col).alias("__win"))
    )
    deduped = hashed.join(
        winners, hashed["__th"] == winners["__th"], "left"
    ).select(
        hashed["*"], (F.col("__win") == F.col(id_col)).alias("__is_win")
    )
    # stage 3: deterministic per-stratum cap over survivors so far
    if cap_per_stratum is not None:
        survivors = deduped.filter(
            (F.col("drop_cause") == "") & F.col("__is_win")
        )
        capped = stratified_sample(
            survivors.select(id_col, strata_col),
            strata_cols=(strata_col,),
            k=cap_per_stratum,
            id_col=id_col,
            seed=seed,
        ).select(F.col(id_col).alias("__kept_id"))
        deduped = deduped.join(
            capped, deduped[id_col] == F.col("__kept_id"), "left"
        )
    else:
        deduped = deduped.withColumn(
            "__kept_id", F.when(F.col("__is_win"), F.col(id_col))
        )
    stage = (
        F.when(F.col("drop_cause") != "", F.concat(F.lit("filter:"), F.col("drop_cause")))
        .when(~F.col("__is_win"), F.lit("dedup"))
        .when(F.col("__kept_id").isNull(), F.lit("cap"))
        .otherwise(F.lit(""))
    )
    return (
        deduped.withColumn("drop_stage", stage)
        .withColumn("kept", F.col("drop_stage") == "")
        .drop("__th", "__is_win", "__kept_id", "drop_cause")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff between two corpus versions — the bookkeeping step
    of an INCREMENTAL pipeline (recrawl → diff → re-curate only the
    churn, never the full 100 TB): per id, ``status`` ∈ {added,
    removed, changed, unchanged} by 128-bit content hash.

    Scale shape: both sides reduce to (id, md5) projections before the
    single full-outer hash join — the text never moves; downstream
    stages filter ``status != 'unchanged'`` and join back by id against
    the new snapshot only.
    """
    o = old.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("__oh")
    )
    n = new.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("__nh")
    )
    j = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("__id").alias(id_col), status.alias("status"))


def recrawl_schedule(
    history: DataFrame,
    id_col: str = "doc_id",
    round_col: str = "round",
    changed_col: str = "changed",
    min_interval: int = 1,
    max_interval: int = 64,
) -> DataFrame:
    """Adaptive re-crawl scheduling from per-round change observations —
    the freshness policy of a CONTINUOUS crawl (grounded in the public
    Cho & Garcia-Molina revisit-frequency results: revisit faster what
    changes faster). Input is one row per (page, crawl round) with a
    ``changed`` flag — exactly what chaining :func:`corpus_diff` over
    successive snapshots produces.

    Per page: Laplace-smoothed change rate ``(n_changes+1)/(n_obs+2)``
    and a power-of-two revisit interval — the largest power of two ≤
    the smoothed mean rounds-between-changes, clamped to
    [min_interval, max_interval] — plus ``due_round`` (last observed
    round + interval). Power-of-two intervals bucket the frontier into
    O(log max_interval) cohorts, so the scheduler's per-round pick is
    a partition-pruned scan of the due cohorts, not a full-frontier
    re-sort; the interval itself is INTEGER arithmetic end to end
    (engine-exact — no float schedule drift at 10^10 pages).

    Scale shape: one map-side-combined groupBy on the page id; output
    is ids + small ints only.
    """
    if min_interval < 1 or max_interval < min_interval:
        raise ValueError("need 1 <= min_interval <= max_interval")
    agg = history.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col(changed_col).cast("int")).alias("n_changes"),
        F.max(F.col(round_col)).alias("last_round"),
    )
    # largest power of two <= (n_obs+2) div (n_changes+1), clamped —
    # a CASE chain on integer comparisons (identical in any engine)
    x = F.expr("(n_obs + 2) div (n_changes + 1)")
    p = 1
    powers = []
    while p <= max_interval:
        if p >= min_interval:
            powers.append(p)
        p *= 2
    expr = F.lit(powers[0])
    for pw in powers[1:]:
        expr = F.when(x >= pw, F.lit(pw)).otherwise(expr)
    return agg.select(
        id_col,
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_changes").cast("long").alias("n_changes"),
        F.round(
            (F.col("n_changes") + F.lit(1.0)) / (F.col("n_obs") + F.lit(2.0)), 6
        ).alias("change_rate"),
        expr.cast("long").alias("revisit_interval"),
        (F.col("last_round") + expr).cast("long").alias("due_round"),
    )


def split_corpus(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    seed: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment — the standard
    hash-bucket split (every engine and every rerun must agree on
    which documents are held out, or decontamination breaks): bucket
    = first 8 md5 hex digits of ``seed:id`` as an integer mod the
    weight total, mapped to splits by cumulative ranges.

    ``weights`` are INTEGER parts (default ``{"train": 98, "val": 1,
    "test": 1}``); expected split sizes follow the parts exactly in
    distribution, and the assignment is a pure projection — no
    shuffle, no sampling state, stable under any partitioning, and
    reproducible from the id alone (new documents join their split
    without touching old ones — the property random splits lack).
    """
    weights = weights or {"train": 98, "val": 1, "test": 1}
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    total = sum(weights.values())
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % total
    )
    names = sorted(weights)  # deterministic range order
    expr = None
    lo = 0
    for name in names:
        hi = lo + weights[name]
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn("bucket", bucket.cast("long")).withColumn(
        "split", expr
    )
