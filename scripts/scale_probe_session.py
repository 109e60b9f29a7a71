"""10x scale probe for the final-session operators (SCALE_r5 addendum 3).

Same staging recipe as scale_probe_close.py: 10x replicas of the fact
tables with shifted keys (disjoint KG subgraphs per replica — the 100 TB
shape), dimensions unreplicated. Each op timed at the base SF and at 10x
in the same JVM; wall ratio vs the 10x row ratio is the linearity
evidence.

The three proximity-GRAPH ops (ktruss / mis / coreness) are probed
across the REAL SFs (sf0.01 -> sf0.1) instead: replicated doc_ids fold
onto the same 1000x2000 coordinate lattice (10M % 1000 == 0), which
would densify the graph quadratically — a synthetic artifact, not the
workload. The real SFs grow the lattice occupancy the way the generator
intends (sf0.01 -> sf0.1 is 10x docs -> ~6x edges).

Usage: python scripts/scale_probe_session.py [sf_dir] [out_dir]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from citykg.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/citykg_scale10_session"
REPL = 10

spark = get_spark("scale-probe-session", master="local[16]", shuffle_partitions=32)
from pyspark.sql import functions as F  # noqa: E402


def stage():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    reps = spark.range(REPL).select(F.col("id").alias("_r"))

    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        l.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("_r") * 100_000_000).alias("l_orderkey"),
            "l_partkey",
            (F.col("l_suppkey") + F.col("_r") * 1_000_000).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
        .write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")
    )
    o = spark.read.parquet(f"{SF}/orders.parquet")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("_r") * 100_000_000).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite").parquet(f"{OUT}/orders.parquet")
    )
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    (
        s.crossJoin(reps)
        .select(
            (F.col("s_suppkey") + F.col("_r") * 1_000_000).alias("s_suppkey"),
            *[c for c in s.columns if c != "s_suppkey"],
        )
        .write.mode("overwrite").parquet(f"{OUT}/supplier.parquet")
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
            (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
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
    for dim in ("customer", "nation", "part", "region"):
        shutil.copy(f"{SF}/{dim}.parquet", f"{OUT}/{dim}.parquet")


REPLICA_OPS = [
    ("volume_shipping", "lineitem"),
    ("market_share", "lineitem"),
    ("product_profit", "lineitem"),
    ("interval_allen", "events"),
    ("ann_hard_negatives", "embeddings"),
    ("mmr_rerank", "embeddings"),
    ("rouge_l_eval", "documents"),
    ("ngram_novelty", "documents"),
    ("corpus_pipeline", "documents"),
    ("kg_counts_sets", "documents"),
    ("kg_update_where", "documents"),
    ("owl_property_chain", "documents"),
]

# proximity-graph ops: measured across the real SFs (see module docstring)
GRAPH_OPS = ["graph_ktruss", "graph_mis", "graph_coreness"]


def main():
    t0 = time.time()
    stage()
    print(f"stage {time.time() - t0:8.2f}s")
    for t in ("lineitem", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"rows {t:12s} {n:>12,}")

    import __spark_entry__ as entry

    qs = entry.queries()
    print(f"{'op':26s} {'base_s':>8s} {'x10_s':>8s} {'ratio':>6s}")
    for name, fam in REPLICA_OPS:
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
    print("-- proximity-graph ops across real SFs (sf0.01 -> sf0.1, 10x docs)")
    for name in GRAPH_OPS:
        t0 = time.time()
        n_base = qs[name](spark, "/root/testdata/sf0.01").count()
        base_s = time.time() - t0
        t0 = time.time()
        n_big = qs[name](spark, "/root/testdata/sf0.1").count()
        big_s = time.time() - t0
        print(
            f"{name:26s} {base_s:8.2f} {big_s:8.2f} {big_s / max(base_s, 1e-9):6.2f}"
            f"  rows {n_base:,} -> {n_big:,}  [proximity graph]"
        )


if __name__ == "__main__":
    main()
