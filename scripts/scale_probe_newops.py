"""10x scale probe for the session-close operators (SCALE_r5 addendum).

Stages a 10x replica of the sf0.1 events/documents/embeddings tables
into /tmp (ids shifted per replica; document texts perturbed with a
replica token every 3 words so replicas sit FAR below the dedup
thresholds — the probe measures the blocking machinery at 10x row
count, not a synthetic duplicate-clique explosion, which is a different
workload), then times the new operator families at local[16] (the
measured sweet spot from BENCH/BASELINE.md).

Usage: python scripts/scale_probe_newops.py [sf_dir] [out_dir]
Prints one line per op: name, rows_out, wall seconds.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from citykg.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/citykg_scale10"
REPL = 10

spark = get_spark("scale-probe", master="local[16]", shuffle_partitions=32)
from pyspark.sql import functions as F  # noqa: E402


def stage():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    reps = spark.range(REPL).select(F.col("id").alias("_r"))
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("_r") * 10_000_000).alias("event_id"),
            F.col("ts"),
            (F.col("user_id") + F.col("_r") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/events.parquet")
    )
    d = spark.read.parquet(f"{SF}/documents.parquet")
    # perturb: inject a replica marker every 3rd word -> inter-replica
    # 3-gram Jaccard ~ 0, so dedup gold scales ~linearly with rows
    perturbed = (
        "concat_ws(' ', flatten(transform("
        "  arrays_zip(split(trim(text), '\\\\s+'), "
        "             sequence(0, size(split(trim(text), '\\\\s+')) - 1)), "
        "  p -> CASE WHEN p['1'] % 3 = 2 THEN array(p['0'], concat('r', _r)) "
        "       ELSE array(p['0']) END)))"
    )
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
            F.expr(perturbed).alias("text"),
            "lang",
            "source",
            "n_chars",
            F.col("_r"),
        )
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_r") * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )


def main():
    t0 = time.time()
    stage()
    print(f"stage          {'':>12}  {time.time() - t0:8.2f}s")
    for t in ("events", "documents", "embeddings"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"rows {t:12s} {n:>12,}")

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "event_gapfill",
        "event_rolling",
        "event_cusum",
        "event_twa",
        "event_reach",
        "event_winsorize",
        "spatial_knn",
        "text_containment",
        "dedup_recall_eval",
        "emb_standardize",
        "ann_recall_eval",
        "kg_shacl_report",
        "graph_random_walks",
        "link_eval_pr",
        "corpus_heaps",
        "nation_revenue_share",
    ):
        if name in ("nation_revenue_share",):
            # needs lineitem/supplier/nation — run against the base SF
            # (the fact side is already the largest table at this SF)
            sfd = SF
        else:
            sfd = OUT if name not in ("kg_shacl_report", "graph_random_walks",
                                      "link_eval_pr") else SF
        t0 = time.time()
        n = qs[name](spark, sfd).count()
        print(f"{name:22s} rows={n:>10,}  wall={time.time() - t0:8.2f}s  sf={'10x' if sfd == OUT else 'sf0.1'}")


if __name__ == "__main__":
    main()
