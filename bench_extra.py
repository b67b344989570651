"""Round-6 optimization side-bench (bench.py is FROZEN for measurement).

Per-query isolation of the operator suite per the optimization guide
§1.1/§1.4: times each declared query with the SAME methodology as
bench.py (`df.count()` after building the plan), optionally repeats,
optionally captures `.explain("formatted")` to plans/r06/.

Usage:
  python bench_extra.py [--repeat N] [--plans DIR_SUFFIX] [q ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")


def _spark():
    from walker_spark.session import get_spark

    s = get_spark(
        app_name="walker-spark-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    s.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    for k, v in json.loads(os.environ.get("EXTRA_CONF", "{}")).items():
        s.conf.set(k, v)
    s.sparkContext.setLogLevel("ERROR")
    return s


def main():
    args = sys.argv[1:]
    repeat = 1
    plans_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif args[i] == "--plans":
            plans_dir = os.path.join(_HERE, "plans", "r06")
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(v):
        return v

    spark.range(1000).select(_warm("id")).count()

    from bench import BENCH_QUERIES

    todo = names or BENCH_QUERIES
    out = {}
    for name in todo:
        samples = []
        for r in range(repeat):
            spark.sparkContext.setJobDescription(f"bx:{name}#{r}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples, "rows": n}
        print(f"{name}: min={min(samples)} samples={samples} rows={n}", flush=True)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
