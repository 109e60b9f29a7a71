"""10x scale probe for the closing-session operators (SCALE_r5 addendum 4).

Same protocol as scale_probe_final.py: stage a 10x replica of the sf0.1
fact tables into /tmp (doc_ids shifted by 10_000_003, coprime to the
anchor grid), time each new op at base and at 10x in the same JVM (base
first), and read the wall ratio against the 10x work growth.

graph_diameter and graph_neighborhood are NOT probed through the staged
corpus: they ride the radius-100 DWithin pair graph, and stacking 10x
docs into the same 1000x2000 grid grows per-cell density 10x and the
pair count ~100x — a property of the synthetic co-location, not of the
operators. Their kernels (shortest_paths, bounded_reachability) are
probed instead on a constant-degree small-world graph at n and 10n
nodes, which is the honest 10x-nodes/10x-edges scaling question.

Usage: python scripts/scale_probe_session5b.py [sf_dir] [out_dir]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from citykg.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/citykg_scale10_s5b"
REPL = 10
DOC_SHIFT = 10_000_003

spark = get_spark("scale-probe-s5b", master="local[16]", shuffle_partitions=32)
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
            # custkey shifted here: customer_gini ranks CUSTOMERS, so the
            # honest 10x question is 10x customers, not 10x orders over a
            # fixed dim
            (F.col("o_custkey") + F.col("_r") * 10_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
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
    ("interval_concurrency", "events"),
    ("t_closeness", "events"),
    ("customer_gini", "orders"),
    ("dedup_soft_weights", "documents"),
    ("spatial_geodesic_area", "documents"),
    ("text_rake", "documents"),
    ("kg_dictionary_stats", "documents"),
    ("graph_degree_powerlaw", "documents"),
    ("graph_rich_club", "documents"),
]


def small_world(n: int, k: int = 6):
    """Constant-degree graph: k ring successors + one multiplicative
    chord per node -> diameter O(log n), degree k+1 at any n."""
    ids = spark.range(n)
    ring = ids.select(
        F.col("id").alias("src"),
        F.explode(F.expr(f"sequence(1, {k})")).alias("d"),
    ).select("src", ((F.col("src") + F.col("d")) % n).alias("dst"))
    chord = ids.select(
        F.col("id").alias("src"),
        ((F.col("id") * 2654435761) % n).alias("dst"),
    )
    return ring.unionByName(chord).where(F.col("src") != F.col("dst")).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )


def kernel_probes():
    from citykg.ops import graph

    rows = []
    for name, fn in (
        (
            "shortest_paths(10 hops)",
            lambda n: graph.shortest_paths(small_world(n), "0", max_hops=10).count(),
        ),
        (
            "bounded_reachability(d=3)",
            lambda n: graph.bounded_reachability(small_world(n), max_depth=3).count(),
        ),
    ):
        t0 = time.time()
        n_base = fn(50_000)
        base_s = time.time() - t0
        t0 = time.time()
        n_big = fn(500_000)
        big_s = time.time() - t0
        rows.append((name, base_s, big_s, n_base, n_big))
    return rows


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
            f"{name:26s} {base_s:8.2f} {big_s:8.2f} {big_s / base_s:6.2f}"
            f"   rows {n_base} -> {n_big}"
        )
    print("\nkernel probes (constant-degree small world, n=50k vs 500k):")
    print(f"{'kernel':26s} {'base_s':>8s} {'x10_s':>8s} {'ratio':>6s}")
    for name, base_s, big_s, n_base, n_big in kernel_probes():
        print(
            f"{name:26s} {base_s:8.2f} {big_s:8.2f} {big_s / base_s:6.2f}"
            f"   rows {n_base} -> {n_big}"
        )


if __name__ == "__main__":
    main()
