"""Cross-engine deterministic string hash.

Base-31 character fold modulo the 57-bit prime 2^57-13 — plain modular
arithmetic, so the SAME value is computable by Spark SQL expressions
(JVM-side, ANSI-safe: acc*31 + char < 2^63) and by any ANSI-SQL engine
(the driver's DuckDB oracles re-derive it independently). Used where
determinism must survive resume AND be value-checkable end-to-end:
dataset split assignment, stratified sampling, global shuffle order,
SimHash token hashing (citykg.ops.dedup).

For pure Spark-side bucketing where no external oracle is needed,
prefer xxhash64 (faster, better avalanche); this fold trades hash
quality headroom for cross-engine reproducibility.
"""

from __future__ import annotations

POLY_P = 144115188075855859  # largest prime below 2^57
POLY_BASE = 31


def char_fold_spark(col_expr: str) -> str:
    """Spark SQL expression: base-31 char fold of `col_expr` mod POLY_P."""
    codes = (
        f"transform(sequence(1, length({col_expr})), "
        f"i -> cast(ascii(substring({col_expr}, i, 1)) as bigint))"
    )
    return (
        f"aggregate({codes}, 0L, "
        f"(acc, ch) -> pmod(acc * {POLY_BASE}L + ch, {POLY_P}L))"
    )


def char_fold_duckdb(col_expr: str) -> str:
    """DuckDB SQL expression computing the identical value (list_reduce
    folds from the first element, so the 0 init is prepended)."""
    codes = (
        f"list_transform(range(1, length({col_expr}) + 1), "
        f"i -> ascii(substr({col_expr}, i, 1)))"
    )
    return (
        f"list_reduce([0::BIGINT] || {codes}, "
        f"(a, c) -> (a * {POLY_BASE} + c) % {POLY_P})"
    )
