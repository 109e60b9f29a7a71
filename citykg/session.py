"""SparkSession factory tuned for the KG-construction workload.

Settings chosen for scale-out (the same knobs matter on a 1000-executor
cluster reading 100 TB; values here are sized for local[N] testing):

* AQE on (runtime coalescing + skew-join splitting) — the linking and
  connected-components self-joins are the skew hot spots
  (BASELINE.json north_rule: "skew handled explicitly").
* shuffle.partitions modest locally; on a real cluster this is set to
  ~2-3x total cores or left to AQE's coalescing.
* Arrow enabled for the few pandas-UDF paths (geometry tree walks,
  simhash bit-fold) — everything else stays JVM-side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "citykg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("CITYKG_MASTER", "local[*]")
    cores = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cores:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # local mode: match parallelism; cluster: caller/AQE decides
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = 32 if n in ("*", "") else max(int(n), 4)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("CITYKG_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # zstd over snappy: ~30% smaller files at comparable CPU — at
        # 100 TB the scan is IO-bound, so the smaller footprint wins
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        # permissive SQL semantics: str_to_map duplicate keys keep last;
        # no ANSI cast errors on dirty web-scale text
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def stable(df, eager: bool = True):
    """Lineage cut for iterative loops (CC / PageRank / betweenness / BFS).

    Default is `localCheckpoint` — executor-local blocks, no extra IO, the
    right call in this sandbox and for short loops. Its documented weakness
    on a real cluster: the cut RDD's blocks live only on executors, so an
    executor loss mid-loop loses partitions whose lineage no longer exists
    and the job fails (the reference's agents simply re-run the task;
    Spark needs a durable cut instead).

    Set `spark.citykg.checkpointDir` (session conf or --conf) to an
    HDFS/object-store path to flip EVERY loop cut to reliable
    `checkpoint()`: each cut is written to and re-read from durable
    storage, so executor loss only recomputes the current iteration. Cost:
    one write+read per cut — size `checkpoint_every` accordingly (the
    loops already expose it)."""
    sp = df.sparkSession
    ckpt_dir = sp.conf.get("spark.citykg.checkpointDir", "")
    if ckpt_dir:
        sc = sp.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
