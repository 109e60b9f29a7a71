"""10x scale probe for the round-close operators (SCALE_r5 addendum 2).

Stages a 10x replica of the sf0.1 fact tables into /tmp — lineitem and
orders with shifted keys (order/customer key spaces kept consistent so
join selectivity is preserved), events with shifted event/user ids,
documents with shifted doc_ids (text untouched: the KG ops derive IRIs
from doc_id, so replicas yield disjoint subgraphs — the workload scales
in graph COUNT, which is exactly the 100 TB shape), embeddings with
shifted vec_ids. Dimensions (customer, supplier, nation, part, region)
are copied unreplicated — at scale dims stay broadcastable while facts
grow, which is the point being probed.

Each op is timed at the BASE SF and at 10x in the same JVM (base first,
so JIT warmup favors neither); the wall ratio against the 10x row ratio
is the linearity evidence. local[16] — the measured sweet spot from
BENCH/BASELINE.md.

Usage: python scripts/scale_probe_close.py [sf_dir] [out_dir]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from citykg.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/citykg_scale10_close"
REPL = 10

spark = get_spark("scale-probe-close", master="local[16]", shuffle_partitions=32)
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
            # custkey UNSHIFTED: the customer dim stays fixed while fact
            # volume grows 10x (the real 100 TB shape)
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite").parquet(f"{OUT}/orders.parquet")
    )
    # suppkey IS shifted in lineitem (tests the per-(supp,part) agg at 10x
    # keys); stage a matching 10x supplier dim so the name attach resolves
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
        shutil.copytree(
            f"{SF}/{dim}.parquet", f"{OUT}/{dim}.parquet", dirs_exist_ok=False
        ) if os.path.isdir(f"{SF}/{dim}.parquet") else shutil.copy(
            f"{SF}/{dim}.parquet", f"{OUT}/{dim}.parquet"
        )


OPS = [
    # (name, which fact family it scales in)
    ("approx_distinct_hll", "events"),
    ("heavy_hitters_cms", "events"),
    ("event_window_zoo", "events"),
    ("event_autocorr", "events"),
    ("event_seasonality", "events"),
    ("event_pivot", "events"),
    ("returned_item_revenue", "lineitem"),
    ("dominant_part_suppliers", "lineitem"),
    ("shipmode_priority", "lineitem"),
    ("promo_revenue_ratio", "lineitem"),
    ("late_exclusive_suppliers", "lineitem"),
    ("top_supplier_revenue", "lineitem"),
    ("kg_reachability", "documents"),
    ("kg_describe", "documents"),
    ("kg_topo_levels", "documents"),
    ("graph_scc", "documents"),
    ("kg_ask", "documents"),
    ("emb_pca_power", "embeddings"),
    ("ann_int8_recall", "embeddings"),
    ("ann_mrl_eval", "embeddings"),
]


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
