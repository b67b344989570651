"""Streaming WET ingest: files landing incrementally are parsed
exactly once, and the composed stateful dedup drops cross-batch (and
cross-restart) duplicate texts."""

import glob
import os
import shutil

from walker_spark.sources.wet import write_wet
from walker_spark.streaming.ingest import stream_wet, stream_wet_deduped


def _wave(spark, ids_texts):
    return spark.createDataFrame(list(ids_texts), "doc_id long, text string")


def _land(src_dir, wet_dir, prefix):
    for f in glob.glob(src_dir + "/*.warc.wet.gz"):
        shutil.move(f, os.path.join(wet_dir, prefix + os.path.basename(f)))


def _drain(stream_df, ck, sink):
    # memory sinks can't recover from a checkpoint; foreachBatch +
    # append-parquet can (same pattern as test_streaming_dup_counts)
    def emit(df, _epoch):
        df.write.mode("append").parquet(sink)

    q = (
        stream_df.writeStream.foreachBatch(emit)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _rows(spark, sink):
    return {
        (int(r["target_uri"].rsplit("/", 1)[1]), r["text"])
        for r in spark.read.parquet(sink).collect()
    }


def test_stream_wet_parses_incrementally(spark, tmp_path):
    wet_dir, ck, sink = (str(tmp_path / d) for d in ("wet", "ck", "sink"))
    os.makedirs(wet_dir, exist_ok=True)
    write_wet(_wave(spark, [(i, f"first wave doc {i}") for i in range(20)]),
              wet_dir, n_files=2)
    _drain(stream_wet(spark, wet_dir + "/*.warc.wet.gz"), ck, sink)
    assert _rows(spark, sink) == {(i, f"first wave doc {i}") for i in range(20)}

    # second wave lands as NEW files; the restarted query processes
    # only them (file-source exactly-once), old rows are not re-emitted
    write_wet(_wave(spark, [(100 + i, f"second wave doc {i}") for i in range(5)]),
              str(tmp_path / "more"), n_files=1)
    _land(str(tmp_path / "more"), wet_dir, "late-")
    _drain(stream_wet(spark, wet_dir + "/*.warc.wet.gz"), ck, sink)
    assert _rows(spark, sink) == {(i, f"first wave doc {i}") for i in range(20)} | {
        (100 + i, f"second wave doc {i}") for i in range(5)
    }


def test_stream_wet_deduped_across_batches(spark, tmp_path):
    wet_dir, ck, sink = (str(tmp_path / d) for d in ("wet", "ck", "sink"))
    os.makedirs(wet_dir, exist_ok=True)
    write_wet(
        _wave(spark, [(0, "alpha text"), (1, "beta text"), (2, "alpha text")]),
        wet_dir, n_files=1,
    )
    _drain(stream_wet_deduped(spark, wet_dir + "/*.warc.wet.gz"), ck, sink)
    got1 = _rows(spark, sink)
    # within-batch dup dropped: exactly one "alpha text" survives
    assert sorted(t for _, t in got1) == ["alpha text", "beta text"]

    # a later file repeats an old text and adds a new one: the state
    # store remembers the seen set across the query restart
    write_wet(
        _wave(spark, [(10, "alpha text"), (11, "gamma text")]),
        str(tmp_path / "w2"), n_files=1,
    )
    _land(str(tmp_path / "w2"), wet_dir, "late-")
    _drain(stream_wet_deduped(spark, wet_dir + "/*.warc.wet.gz"), ck, sink)
    assert _rows(spark, sink) - got1 == {(11, "gamma text")}
