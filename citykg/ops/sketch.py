"""Probabilistic sketch operators — the 100 TB approximation patterns.

At 10^12 rows the exact distinct counts and exact heavy-hitter tables
this repo's diagnostic queries compute become their own shuffles; the
standard production swap is a mergeable sketch whose per-partition
state is tiny and whose merge is associative, so Spark's partial
aggregation does all the work map-side. This module ships the two
canonical ones:

- HyperLogLog (Flajolet et al. 2007, the `approx_count_distinct`
  algorithm) — but built from md5 (the one hash Spark and DuckDB share
  bit-for-bit, the same cross-engine anchor citykg.ops.text uses for
  fingerprints), so the DuckDB oracle reconstructs the IDENTICAL
  register file and the estimate is value-checked end to end, which
  Spark's own HLL (xxhash-based, engine-private layout) cannot be.
  The cheap base-31 char fold (citykg.ops.hashing) is NOT usable here:
  it has no avalanche, and HLL's rank statistic reads raw high bits —
  measured on sequential keys it overestimates 2x and worse.
- Count-Min (Cormode & Muthukrishnan 2005) — d x w counter matrix via
  one partial-agg groupBy; point estimates = min over the d rows. Row
  salts go INSIDE the md5 so the d rows are genuinely independent
  (salting a linear fold only offsets it: same-length keys that collide
  in one row would collide in all d). All-integer, so cross-engine
  agreement is exact by construction.

Scale shape: both sketches are one `groupBy(...).agg(...)` whose key
cardinality is bounded by the sketch size (m registers / d*w counters)
TIMES the group key — independent of input rows. Map-side combine
reduces each partition to <= sketch-size rows before the shuffle, so
the shuffle volume at 10^12 rows equals the shuffle volume at 10^6.

Reference parity note: the reference has no sketch layer (it counts
exactly in SQL, e.g. CityInformationAgent's COUNT queries); this module
is part of the training-data-pipeline surface per SURVEY §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 56-bit hash = the first 14 hex digits of md5: low p bits pick the
# register, the remaining (56-p) bits feed the rank (leading-zero)
# count. With p=8: w < 2^48, rank in [1, 49].
_HASH_BITS = 56


def md5_56_spark(expr: str) -> str:
    """Spark SQL: first 56 bits of md5(expr) as a non-negative bigint."""
    return f"cast(conv(substring(md5({expr}), 1, 14), 16, 10) as bigint)"


def md5_56_duckdb(expr: str) -> str:
    """DuckDB SQL computing the identical 56-bit value."""
    return f"('0x' || substr(md5({expr}), 1, 14))::BIGINT"


def hll_register_exprs(key_expr: str, p: int = 8):
    """(bucket, rho) Column pair for one key expression — the per-row
    register contribution. Used by the streaming register builder where
    the two-step select of hll_registers can't interpose; Catalyst CSE
    collapses the repeated md5 in codegen."""
    m = 1 << p
    wid = _HASH_BITS - p
    h = F.expr(md5_56_spark(key_expr))
    w_expr = f"({md5_56_spark(key_expr)}) div {m}"
    rho = F.when(F.expr(w_expr) == 0, F.lit(wid + 1)).otherwise(
        F.lit(wid + 1) - F.length(F.expr(f"bin({w_expr})"))
    )
    return (h % m), rho


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register file: (group..., bucket, m_rank).

    bucket = h mod 2^p; the remaining (56-p)-bit word w ranks as
    rho = (56-p) - bitlength(w) + 1 (all-zero word -> max rank). bin()
    renders the minimal binary string on both engines, so bitlength is
    length(bin(w)) — integer-exact everywhere. One groupBy; partial agg
    caps the shuffle at m rows per group per partition.
    """
    m = 1 << p
    wid = _HASH_BITS - p
    hashed = df.select(
        *group_cols,
        F.expr(md5_56_spark(f"cast({key_col} as string)")).alias("_h"),
    ).select(
        *group_cols,
        (F.col("_h") % m).alias("bucket"),
        F.expr(f"_h div {m}").alias("_w"),  # integer div: float / loses bits past 2^53
    )
    rho = F.when(F.col("_w") == 0, F.lit(wid + 1)).otherwise(
        F.lit(wid + 1) - F.length(F.expr("bin(_w)"))
    )
    return (
        hashed.select(*group_cols, "bucket", rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_rank"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Fold a register file into the HLL estimate, one row per group.

    The harmonic-mean denominator is computed as the INTEGER
    sum(2^(maxrank - m_rank)) + absent_registers * 2^maxrank (bigint,
    order-independent — the float version would be summation-order
    sensitive and could diverge across engines), then converted to
    double exactly once. Small-range correction (linear counting when
    E <= 2.5m and empty registers exist) uses the same integer V, so
    both engines take the same branch deterministically.
    """
    m = 1 << p
    maxrank = _HASH_BITS - p + 1  # rho's upper bound; 2^maxrank fits bigint
    alpha = _hll_alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {maxrank} - m_rank)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    big = 1 << maxrank
    s_total = F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(big)
    # numerator precomputed in Python so both engines divide the SAME
    # double by the SAME integer — one IEEE op, no association ambiguity
    e_raw = F.lit(alpha * m * m * float(big)) / s_total
    v = F.lit(m) - F.col("n_present")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_estimate"))


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Count-Min counter matrix: (r, bucket, cnt), d*w rows max.

    Row r's bucket is md5('r<r>#<key>') mod w — the salt inside the
    hash makes the d rows independent. One explode + one partial-agg
    groupBy; the shuffle carries at most d*w rows per partition
    regardless of input size.
    """
    key_s = F.col(key_col).cast("string")
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
        key_s.alias("_k"),
    )
    h = F.expr(md5_56_spark("concat('r', cast(r as string), '#', _k)"))
    return (
        rows.select("r", (h % w).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each key in `keys`: the min over the d
    row counters. `keys` is expected to be small (a top-k list) and is
    re-hashed with the same salted md5; the sketch side is d*w rows so
    the join broadcasts. Returns (key..., cms_estimate).
    """
    key_s = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
        key_s.alias("_k"),
    ).withColumn(
        "bucket",
        F.expr(md5_56_spark("concat('r', cast(r as string), '#', _k)")) % w,
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )
