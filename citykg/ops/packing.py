"""Sequence packing: fill fixed-token-budget training bins with documents.

The LLM-training step after dedup/split: concatenate documents into
fixed-length sequences with minimal padding. Exact global first-fit is
inherently sequential, so the distributed shape is two-level:

1. hash-partition docs into `n_groups` independent packing groups (pure
   Project on the cross-engine hash — deterministic, resume-stable);
2. pack each group sequentially in deterministic (hash, id) order with a
   greedy fill (new bin whenever the next doc would overflow the budget),
   inside one Arrow batch per group via applyInPandas.

At 100 TB, `n_groups` scales with the corpus (groups ~ executor-core
count x k), so every group packs in parallel and no single task sees more
than corpus/n_groups rows. Packing quality loss vs a global pass is the
per-group tail bin — negligible when group size >> budget.

Determinism is the point: the same doc always lands in the same
(group, bin) under retry or resume, and the assignment is recomputable by
an independent SQL engine (the driver's DuckDB oracle replays the same
greedy recurrence as a recursive CTE).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .hashing import POLY_P, char_fold_spark


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
    n_groups: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Returns (id, tokens, grp, bin): group-local bin index per doc.

    Greedy rule: bins fill in (hash, id) order; a doc that would overflow
    the current bin starts the next one; a doc alone larger than the
    budget occupies its own bin (no splitting).
    """
    keyed = f"concat(cast({id_col} as string), '#', '{seed}')"
    okey = f"pmod({char_fold_spark(keyed)}, {POLY_P}L)"
    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(tokens_col).cast("long").alias("tokens"),
        F.expr(f"pmod({okey}, {n_groups}L)").cast("int").alias("grp"),
        F.expr(okey).alias("_okey"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["_okey", "id"]).reset_index(drop=True)
        bins, fill, b = [], 0, 0
        for t in pdf["tokens"]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                b += 1
                fill = 0
            fill += t
            bins.append(b)
        pdf["bin"] = bins
        return pdf[["id", "tokens", "grp", "bin"]]

    schema = "id string, tokens long, grp int, bin int"
    return base.groupBy("grp").applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-group fill efficiency: (grp, n_bins, n_docs, fill_ratio)."""
    per_bin = packed.groupBy("grp", "bin").agg(F.sum("tokens").alias("bin_tokens"))
    return per_bin.groupBy("grp").agg(
        F.count("*").alias("n_bins"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.round(F.sum("bin_tokens") / (F.count("*") * budget), 4).alias("fill_ratio"),
    )
