"""Streaming frontier hygiene — the live counterpart of
``operators/frontier.py::url_trap_templates``: a crawler discovers
trap templates WHILE crawling, so the counter has to run on the
discovered-URL stream and flip the flag the moment a (host, template)
family crosses the threshold.

State shape per (host, template): the distinct-URL count plus, only
UNTIL the threshold trips, a set of url md5s for distinctness — once a
family is flagged the set is dropped and the state is two integers, so
per-key memory is bounded by ``trap_threshold`` md5s and the keys that
matter most (the trap generators, which produce unbounded URLs) are
exactly the ones that cost the least. NoTimeout: a trap flag is a
fact about the site, not a windowed aggregate; bound total state by
key cardinality (templates, not URLs).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.frontier import url_host_expr, url_template_expr

__all__ = ["streaming_trap_templates"]


def streaming_trap_templates(
    stream: DataFrame,
    url_col: str = "url",
    trap_threshold: int = 1000,
) -> DataFrame:
    """Emit ``(host, template, n_urls, is_trap)`` updates whenever a
    (host, template) family receives new DISTINCT urls. Replayed to
    completion, the flagged set equals the batch
    :func:`~walker_spark.operators.frontier.url_trap_templates`
    verdicts (proven by test_streaming_traps); counts saturate at the
    threshold once flagged (distinctness tracking stops — documented
    bounded-state trade)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        url_host_expr(F.col(url_col)).alias("host"),
        url_template_expr(F.col(url_col)).alias("template"),
        F.col(url_col).alias("url"),
    )

    def fn(key, pdfs, state):
        if state.exists:
            n, flagged, seen_s = state.get
            seen = set((seen_s or "").split(",")) - {""}
        else:
            n, flagged, seen = 0, False, set()
        for pdf in pdfs:
            for u in pdf["url"]:
                if flagged:
                    break
                h = hashlib.md5(str(u).encode()).hexdigest()[:16]
                if h not in seen:
                    seen.add(h)
                    n += 1
                    if n >= trap_threshold:
                        flagged = True
                        seen = set()
        state.update((n, flagged, ",".join(sorted(seen))))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "template": [key[1]],
                "n_urls": [n],
                "is_trap": [flagged],
            }
        )

    return keyed.groupBy("host", "template").applyInPandasWithState(
        fn,
        outputStructType="host string, template string, n_urls long, is_trap boolean",
        stateStructType="n long, flagged boolean, seen string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
