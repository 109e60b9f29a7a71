"""Stage 2 — entity linking: mentions -> gazetteer entities.

The reference links exactly, by gmlId/IRI equality (UIDCache.lookupAndPut,
UIDCache.java:80-100; xlink resolution joins, Importer.java:411-448). That
exact path is `link_exact` — a broadcast hash join against the exploded
alias table (the gazetteer is the small dimension; broadcasting it removes
the shuffle entirely).

The fuzzy path (BASELINE.json north_star) adds MinHash-LSH blocking so
near-miss surface forms link without the O(n²) pair explosion. Everything
is built-in Spark expressions — shingling, min-hashing, banding are
`transform`/`aggregate`/`xxhash64` over arrays, JVM-side, no Python UDFs:

    shingles(text)                       char 3-grams, array_distinct
    sig[i]  = min over shingles of ((a_i * xxhash64(s) + b_i) mod p)
    band[j] = xxhash64(sig[j*r .. j*r+r-1])
    candidates = join mentions x gazetteer on (band_idx, band_hash)
    verify     = exact Jaccard on shingle arrays >= threshold

Scale notes (100 TB): the band join's key distribution is uniform by
construction (hashes), so the only skew source is many identical mention
strings — dedupe mention TEXTS before the join (`distinct` on the text)
and re-attach doc occurrences afterwards; that turns a mega-entity with
10^8 occurrences into ONE row on the join side. AQE skew-join remains on
as a backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic MinHash permutation constants (Mersenne prime modulus)
_P = (1 << 61) - 1


def _perm_consts(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    # deterministic LCG over the seed — no RNG state, resumable.
    # a < 2^30 and the hash is masked to 32 bits in with_minhash, so
    # a*h + b < 2^62 + 2^61 < 2^63: no int64 overflow under ANSI mode.
    consts = []
    x = seed
    for _ in range(n_hashes):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % ((1 << 30) - 1)) + 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % _P
        consts.append((a, b))
    return consts


def with_shingles(df: DataFrame, text_col: str, k: int = 3, out: str = "shingles") -> DataFrame:
    """Distinct char k-grams of lower(text), JVM-side. Lowercases ONCE
    into a column first — substring(lower(text), ...) inside the
    per-position lambda re-lowers the whole string per gram
    (O(chars^2) per mention)."""
    return (
        df.withColumn("_lt", F.expr(f"lower({text_col})"))
        .withColumn(
            out,
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(length(_lt) - {k - 1}, 1)),"
                f" i -> substring(_lt, i, {k})))"
            ),
        )
        .drop("_lt")
    )


def with_minhash(
    df: DataFrame,
    shingle_col: str = "shingles",
    n_hashes: int = 64,
    seed: int = 42,
    out: str = "minhash",
) -> DataFrame:
    """n-slot MinHash signature in ONE pass: hash every shingle once
    (xxhash64 over the string is the expensive part — the naive
    one-aggregate-per-slot form recomputes it n_hashes times per shingle),
    then fold the permutation mins with a single array-accumulator
    aggregate over the hash array (n_hashes modmuls per shingle, cheap
    int64 math)."""
    consts = _perm_consts(n_hashes, seed)
    a_arr = "array(" + ", ".join(f"{a}L" for a, _ in consts) + ")"
    b_arr = "array(" + ", ".join(f"{b}L" for _, b in consts) + ")"
    hs = f"transform({shingle_col}, s -> xxhash64(s) & 4294967295L)"
    sig = (
        f"aggregate({hs}, array_repeat(cast(9223372036854775807 as bigint), {n_hashes}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {n_hashes - 1}), "
        f"(m, i) -> least(m, pmod(element_at({a_arr}, i + 1) * h + "
        f"element_at({b_arr}, i + 1), {_P}L))))"
    )
    return df.withColumn(out, F.expr(sig))


def with_bands(
    df: DataFrame,
    sig_col: str = "minhash",
    bands: int = 16,
    rows: int = 4,
    out_idx: str = "band_idx",
    out_hash: str = "band_hash",
) -> DataFrame:
    """Explode the signature into LSH bands; join key = (band_idx, band_hash)."""
    pairs = ", ".join(
        f"named_struct('band_idx', {j}, 'band_hash', "
        f"xxhash64(concat_ws('#', slice({sig_col}, {j * rows + 1}, {rows}))))"
        for j in range(bands)
    )
    return df.withColumn("_band", F.explode(F.expr(f"array({pairs})"))).select(
        "*", F.col("_band.band_idx").alias(out_idx), F.col("_band.band_hash").alias(out_hash)
    ).drop("_band")


def jaccard(col_a: str, col_b: str):
    return F.expr(
        f"size(array_intersect({col_a}, {col_b})) / size(array_union({col_a}, {col_b}))"
    )


def entity_mentions(docs: DataFrame) -> DataFrame:
    """Pull linkable surface forms out of the spans: the address-span city
    value (district/admin-area analog). Returns (doc_id, span_idx, mention)."""
    from .extract import explode_spans, parse_mentions

    # kind pushdown: only address/street spans are generated and parsed
    m = parse_mentions(explode_spans(docs, kinds=["address", "street"]))
    return m.select(
        "doc_id",
        "span_idx",
        F.expr("try_element_at(attrs, 'city')").alias("mention"),
    ).where(F.col("mention").isNotNull())


def _alias_table(gazetteer: DataFrame) -> DataFrame:
    return gazetteer.select(
        "entity_id", F.explode("aliases").alias("alias")
    ).withColumn("alias_norm", F.lower("alias"))


def link_exact(mentions: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Exact alias match — broadcast join, zero shuffle on the fact side
    (UIDCache semantics: first/any entity wins per alias)."""
    aliases = F.broadcast(
        _alias_table(gazetteer).groupBy("alias_norm").agg(F.min("entity_id").alias("entity_id"))
    )
    return (
        mentions.withColumn("alias_norm", F.lower("mention"))
        .join(aliases, "alias_norm", "left")
        .drop("alias_norm")
        .withColumn("link_score", F.when(F.col("entity_id").isNotNull(), F.lit(1.0)))
    )


def link_fuzzy(
    mentions: DataFrame,
    gazetteer: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 64,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH blocked fuzzy linking.

    Default banding is 32 bands x 2 rows: at the linking threshold (0.5
    Jaccard, short surface forms) a true pair collides with probability
    1-(1-0.5^2)^32 > 0.9999, vs a coin-flip 0.64 for 16x4. The extra
    low-similarity candidates are cheap here because the gazetteer side is
    alias-count-bounded and mention texts are deduped pre-join.

    Dedupes mention TEXTS first (skew defusal: a capital city mentioned in
    50% of docs becomes one row in the band join), links each distinct
    text to its best entity by exact Jaccard over the LSH candidates, then
    re-attaches occurrences with a broadcast-friendly join.
    """
    rows = n_hashes // bands
    texts = mentions.select(F.lower("mention").alias("text")).distinct()
    texts = with_bands(
        with_minhash(with_shingles(texts, "text"), n_hashes=n_hashes, seed=seed),
        bands=bands,
        rows=rows,
    ).select("text", "shingles", "band_idx", "band_hash")

    cand_g = with_bands(
        with_minhash(with_shingles(_alias_table(gazetteer), "alias_norm", out="shingles"),
                     n_hashes=n_hashes, seed=seed),
        bands=bands,
        rows=rows,
    ).select(
        "entity_id",
        F.col("alias_norm").alias("g_text"),
        F.col("shingles").alias("g_shingles"),
        "band_idx",
        "band_hash",
    )

    cands = (
        texts.join(cand_g, ["band_idx", "band_hash"])
        .select("text", "shingles", "entity_id", "g_shingles")
        .distinct()
        .withColumn("score", jaccard("shingles", "g_shingles"))
        .where(F.col("score") >= threshold)
    )
    from pyspark.sql import Window

    best = (
        cands.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("text").orderBy(F.desc("score"), F.asc("entity_id"))
            ),
        )
        .where(F.col("rank") == 1)
        .select("text", "entity_id", F.col("score").alias("link_score"))
    )
    return mentions.withColumn("text", F.lower("mention")).join(
        F.broadcast(best), "text", "left"
    ).drop("text")


def link_editdist(
    mentions: DataFrame, gazetteer: DataFrame, max_dist: int = 2
) -> DataFrame:
    """Typo-robust gazetteer linking by Levenshtein distance — the
    record-linkage tier below MinHash (link_fuzzy handles word-level
    drift; this catches character-level typos the shingle bands can
    miss on short strings). Returns every input mention row with its
    best match: (doc_id, span_idx, mention, entity_id, edit_dist),
    entity NULL when nothing is within `max_dist`.

    Blocking is PROVABLY lossless: levenshtein(a, b) <= d implies
    |len(a) - len(b)| <= d, so the alias side fans out to the 2d+1
    length buckets it can match and the join is a plain equi-join on
    the length key — no recall trade-off to audit, unlike prefix
    blocking (which production systems add on top for selectivity when
    the gazetteer is large; note it sacrifices first-char typos).

    Scale shape: distinct mention texts are scored once (the
    link_fuzzy pattern — candidates are proportional to the VOCABULARY
    of mentions, not the corpus), the gazetteer side is broadcast, the
    best match folds via min(struct(dist, entity_id)) — one partial
    agg, no window over data-sized frames — and re-attaches to the
    corpus with a broadcast join. Levenshtein itself is the JVM
    built-in (identical definition in DuckDB, so the oracle compares
    exactly)."""
    aliases = _alias_table(gazetteer).select(
        "entity_id", "alias_norm", F.length("alias_norm").alias("_alen")
    )
    fan = aliases.select(
        "entity_id",
        "alias_norm",
        F.explode(
            F.sequence(F.col("_alen") - max_dist, F.col("_alen") + max_dist)
        ).alias("_lkey"),
    )
    texts = mentions.select(F.lower("mention").alias("_mnorm")).distinct()
    best = (
        texts.withColumn("_lkey", F.length("_mnorm"))
        .join(F.broadcast(fan), "_lkey")
        .withColumn("_dist", F.levenshtein("_mnorm", F.col("alias_norm")))
        .where(F.col("_dist") <= max_dist)
        .groupBy("_mnorm")
        .agg(F.min(F.struct(F.col("_dist"), F.col("entity_id"))).alias("_b"))
        .select("_mnorm", F.col("_b._dist").alias("edit_dist"), F.col("_b.entity_id").alias("entity_id"))
    )
    return (
        mentions.withColumn("_mnorm", F.lower("mention"))
        .join(F.broadcast(best), "_mnorm", "left")
        .drop("_mnorm")
    )


def link_eval(
    gold: DataFrame,
    pred: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
    gold_col: str = "entity_id",
    pred_col: str = "entity_id",
) -> DataFrame:
    """Micro precision/recall/F1 of a predicted entity linking against a
    gold linking — the in-engine twin of the pipeline's own P/R >= 0.95
    acceptance gate, so linker regressions surface as one report row
    instead of a downstream triple diff.

    Per mention key: tp = predicted == gold (both present); fp =
    predicted where gold disagrees or is absent; fn = gold the predictor
    missed or got wrong. ONE full-outer equi-join on the mention keys +
    one global agg — no window, no driver-side compare; the join
    shuffles on the near-unique mention key, so no skew.

    Output (one row): n_mentions, n_tp, n_fp, n_fn, precision, recall,
    f1 (rounded to 6; NULL when undefined)."""
    keys = list(key_cols)
    g = gold.select(*keys, F.col(gold_col).alias("_gold"))
    p = pred.select(*keys, F.col(pred_col).alias("_pred"))
    j = g.join(p, keys, "full_outer")
    gold_nn = F.col("_gold").isNotNull()
    pred_nn = F.col("_pred").isNotNull()
    agree = pred_nn & gold_nn & (F.col("_pred") == F.col("_gold"))
    tp = F.sum(F.when(agree, 1).otherwise(0)).cast("long")
    fp = F.sum(F.when(pred_nn & ~(gold_nn & (F.col("_pred") == F.col("_gold"))), 1)
               .otherwise(0)).cast("long")
    fn = F.sum(F.when(gold_nn & ~(pred_nn & (F.col("_pred") == F.col("_gold"))), 1)
               .otherwise(0)).cast("long")
    out = j.agg(
        F.count("*").cast("long").alias("n_mentions"),
        tp.alias("n_tp"),
        fp.alias("n_fp"),
        fn.alias("n_fn"),
    )
    prec = F.col("n_tp") / (F.col("n_tp") + F.col("n_fp"))
    rec = F.col("n_tp") / (F.col("n_tp") + F.col("n_fn"))
    return out.select(
        "n_mentions",
        "n_tp",
        "n_fp",
        "n_fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(2 * prec * rec / (prec + rec), 6).alias("f1"),
    )
