"""Bisect harness for the r2 kg_pipeline bench regression (VERDICT item 1).

Runs kg_pipeline_run (same job bench.py times) in THIS process with a
config variant selected by argv[1]; prints one JSON line. Run each
variant in its own process (fresh JVM) from the shell.

Variants:
  head      - bench._spark as committed (4 MB maxPartitionBytes override)
  r1split   - drop the 4 MB override (r1-era 128 MB default packing)
  snappy    - 4 MB override but snappy parquet codec (r1 session default)
  r1both    - 128 MB packing + snappy
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from citykg.session import get_spark

VARIANT = sys.argv[1]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark():
    extra = {}
    if VARIANT in ("head", "snappy"):
        extra["spark.sql.files.maxPartitionBytes"] = str(4 * 1024 * 1024)
    if VARIANT in ("snappy", "r1both"):
        extra["spark.sql.parquet.compression.codec"] = "snappy"
    return get_spark(
        "bisect", master=f"local[{CORES}]", shuffle_partitions=max(CORES, 8),
        extra_conf=extra,
    )


spark = make_spark()
spark.read.parquet(f"{SF}/lineitem.parquet").count()
out = bench.kg_pipeline_run(spark, SF, repl=4)
sc = spark.sparkContext._jsc.sc()
execs = sc.statusTracker().getExecutorInfos()
out["variant"] = VARIANT
print("BISECT:" + json.dumps(out))
spark.stop()
