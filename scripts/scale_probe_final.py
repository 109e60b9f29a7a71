"""10x scale probe for the final-tranche operators (SCALE_r5 addendum 3).

Same protocol as scale_probe_close.py: stage a 10x replica of the sf0.1
fact tables into /tmp, time each new op at base and at 10x in the same
JVM (base first), and read the wall ratio against the row ratio.

One staging difference: documents' doc_ids shift by r * 10_000_003 (NOT
a multiple of 1000/2000), so the replicas land on DIFFERENT anchor-grid
positions — proximity-graph density per cell stays constant and the
DWithin-graph ops (neighbor agg, coloring, squares) scale in nodes+edges
(~10x), not in collided-pair count (~100x). The close-probe's 10_000_000
shift preserves doc_id % 1000 and would stack all 10 replicas on the
same coordinates.

Quadratic-by-design note: dedup_threshold_curve compares pairs WITHIN
quantizer cells and the 10x replicas carry IDENTICAL embeddings — true
duplicates — so its in-cell pair count (and wall) grows ~100x by
construction. The production lever is n_planes (more cells), exactly the
SemDeDup scale story documented on semantic_dedup.

Usage: python scripts/scale_probe_final.py [sf_dir] [out_dir]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from citykg.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/citykg_scale10_final"
REPL = 10
DOC_SHIFT = 10_000_003  # coprime to the 1000/2000 anchor grid

spark = get_spark("scale-probe-final", master="local[16]", shuffle_partitions=32)
from pyspark.sql import functions as F  # noqa: E402


def stage():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    reps = spark.range(REPL).select(F.col("id").alias("_r"))

    o = spark.read.parquet(f"{SF}/orders.parquet")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("_r") * 100_000_000).alias("o_orderkey"),
            # custkey UNSHIFTED: the customer dim stays fixed while fact
            # volume grows 10x — abc_analysis then cumulates the same
            # customer count over 10x the order scan
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite").parquet(f"{OUT}/orders.parquet")
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("_r") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_r") * 1_000_000).alias("user_id"),
            "event_type", "value", "props",
        )
        .write.mode("overwrite").parquet(f"{OUT}/events.parquet")
    )
    d = spark.read.parquet(f"{SF}/documents.parquet")
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r") * DOC_SHIFT).alias("doc_id"),
            *[c for c in d.columns if c != "doc_id"],
        )
        .write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    )
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_r") * 10_000_000).alias("vec_id"),
            "embedding", "label",
        )
        .write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    )
    for dim in ("customer", "supplier", "nation", "part", "region", "lineitem"):
        src = f"{SF}/{dim}.parquet"
        dst = f"{OUT}/{dim}.parquet"
        shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)


OPS = [
    ("text_lm_kneser_ney", "documents"),
    ("text_blocklist", "documents"),
    ("kg_turtle_format", "documents"),
    ("geo_volume", "documents"),
    ("spatial_convex_hull", "documents"),
    ("dedup_cdc", "documents"),
    ("graph_neighbor_agg", "documents"),
    ("owl_sameas_rewrite", "documents"),
    ("graph_coloring", "documents"),
    ("spatial_nearest_hub", "documents"),
    ("graph_squares", "documents"),
    ("event_attribution", "events"),
    ("abc_analysis", "orders"),
    ("dedup_threshold_curve", "embeddings"),
]


def main():
    t0 = time.time()
    stage()
    print(f"stage {time.time() - t0:8.2f}s")
    for t in ("orders", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"rows {t:12s} {n:>12,}")

    import __spark_entry__ as entry

    qs = entry.queries()
    print(f"{'op':26s} {'base_s':>8s} {'x10_s':>8s} {'ratio':>6s}")
    for name, fam in OPS:
        t0 = time.time()
        n_base = qs[name](spark, SF).count()
        base_s = time.time() - t0
        t0 = time.time()
        n_big = qs[name](spark, OUT).count()
        big_s = time.time() - t0
        print(
            f"{name:26s} {base_s:8.2f} {big_s:8.2f} {big_s / max(base_s, 1e-9):6.2f}"
            f"  rows {n_base:,} -> {n_big:,}  [{fam}]"
        )


if __name__ == "__main__":
    main()
