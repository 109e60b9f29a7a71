"""Benchmark harness.

Default mode: run the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "docs_per_sec": ...}.

--scaling mode (north_rule evidence): the same KG-construction job on the
same input at local[8] vs local[32] in fresh JVMs; writes
BENCH/BASELINE.md with throughput at both and the scaling efficiency
R_32 / (4 * R_8).

--single-run --cores N --repl K: one measured pipeline run (used by
--scaling via subprocess so each parallelism level gets a cold JVM).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(cores: int):
    from citykg.session import get_spark

    return get_spark("citykg-bench", master=f"local[{cores}]", shuffle_partitions=max(cores, 8))


def _replicated_docs(spark, sf_dir: str, repl: int):
    """Deterministically replicate the synth corpus (doc_id re-keyed per
    replica) — same content, repl x rows; used to give the scaling runs
    enough work to measure compute, not startup."""
    from pyspark.sql import functions as F

    from citykg.fixtures import synth_docs

    docs = synth_docs(spark, sf_dir)
    if repl <= 1:
        return docs
    return docs.withColumn("r", F.explode(F.expr(f"sequence(0, {repl - 1})"))).select(
        F.concat_ws("_", "doc_id", "r").alias("doc_id"), "spans"
    )


def kg_pipeline_run(spark, sf_dir: str, repl: int = 1) -> dict:
    """The measured job: extract -> link -> count + per-graph agg (forces
    the full plan without disk writes)."""
    from pyspark.sql import functions as F

    from citykg.extract import extract_triples, mention_counts
    from citykg.fixtures import synth_gazetteer
    from citykg.link import entity_mentions, link_exact

    docs = _replicated_docs(spark, sf_dir, repl)
    n_docs = docs.count()  # force input materialization before timing
    t0 = time.time()
    triples = extract_triples(spark, docs)
    n_triples = triples.count()
    counts = mention_counts(triples).collect()
    linked = link_exact(entity_mentions(docs), synth_gazetteer(spark))
    n_linked = linked.where(F.col("entity_id").isNotNull()).count()
    wall = time.time() - t0
    return {
        "docs": n_docs,
        "triples": n_triples,
        "graphs": len(counts),
        "linked": n_linked,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def headline(sf_dir: str, cores: int) -> None:
    import __spark_entry__ as entrymod

    spark = _spark(cores)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm FS/JVM

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    pipe = {}

    def run_pipe():
        pipe.update(kg_pipeline_run(spark, sf_dir, repl=4))

    timed("kg_pipeline", run_pipe)

    qs = entrymod.queries()
    for name in (
        "kg_extract_full",
        "kg_canonical_clusters",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_brute_topk",
        "ann_lsh_topk",
        "text_quality",
        "text_fingerprint",
        "lineitem_pricing",
        "join_pipeline",
        "window_rank",
        "tiling",
        "graph_pagerank",
    ):
        timed(name, lambda n=name: qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "citykg_headline_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "docs_per_sec": pipe.get("docs_per_sec"),
                "pipeline": pipe,
                "cores": cores,
            }
        )
    )
    spark.stop()


def single_run(sf_dir: str, cores: int, repl: int) -> None:
    spark = _spark(cores)
    out = kg_pipeline_run(spark, sf_dir, repl)
    out["cores"] = cores
    print("SINGLE_RUN_JSON:" + json.dumps(out))
    spark.stop()


def scaling(sf_dir: str, repl: int = 20) -> None:
    """local[8] vs local[32] on identical input; writes BENCH/BASELINE.md."""
    results = {}
    for cores in (8, 32):
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--single-run",
            "--cores",
            str(cores),
            "--repl",
            str(repl),
        ]
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("SINGLE_RUN_JSON:")]
        if not line:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
            raise RuntimeError(f"scaling run at {cores} cores produced no result")
        results[cores] = json.loads(line[0].split(":", 1)[1])

    r8 = results[8]["docs_per_sec"]
    r32 = results[32]["docs_per_sec"]
    eff = round(r32 / (4 * r8), 3)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured throughput & scaling\n\n"
            "Same job (KG extract + link + aggregate), same input "
            f"({results[8]['docs']} docs = sf dir {sf_dir} synth corpus x{repl}), "
            "two parallelism levels, fresh JVM each (in-sandbox stand-in for "
            "N vs 4N executors per BASELINE.md).\n\n"
            "| cores | docs | wall (s) | docs/sec |\n|---|---|---|---|\n"
            f"| local[8] | {results[8]['docs']} | {results[8]['wall_sec']} | {r8} |\n"
            f"| local[32] | {results[32]['docs']} | {results[32]['wall_sec']} | {r32} |\n\n"
            f"**Scaling efficiency (8 -> 32 cores): {eff}** "
            f"(target >= 0.8, BASELINE.json north_rule)\n"
        )
    print(json.dumps({"metric": "scaling_efficiency_8_to_32", "value": eff, "unit": "ratio",
                      "queries": {"local8_docs_per_sec": r8, "local32_docs_per_sec": r32},
                      "sf": sf_dir}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--single-run", action="store_true")
    ap.add_argument("--cores", type=int, default=CPUS)
    ap.add_argument("--repl", type=int, default=20)
    ap.add_argument("--sf-dir", default=SF_DIR)
    a = ap.parse_args()
    if a.single_run:
        single_run(a.sf_dir, a.cores, a.repl)
    elif a.scaling:
        scaling(a.sf_dir, a.repl)
    else:
        headline(a.sf_dir, a.cores)
