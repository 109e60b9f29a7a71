"""Text analysis operators — all JVM-side built-ins (no Python in the
hot path): token counting, quality scoring, language id, fingerprinting.

Every op here has a DuckDB-expressible twin in __spark_entry__.oracle_sql
(md5 is the one hash both engines share bit-for-bit — fingerprints use it
so the driver's value-hash comparison is meaningful)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# minimal per-language stopword lists for the n-gram/stopword-ratio
# language heuristic (languages match the testdata lang column domain)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "de", "un", "una", "es", "para"],
}

TOKEN_RE = r"\s+"
# BPE-ish subword splitter: letter-runs, digit-runs, or single punctuation
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword count."""
    # pattern passed as a Column literal: embedding it in an expr() string
    # would put it through SQL string-escape processing and corrupt \s
    return df.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col(text_col)), TOKEN_RE))
    ).withColumn(
        "n_subwords", F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), F.lit(0)))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, mean word length, alpha ratio,
    stopword ratio, and a composite score in [0, 1]."""
    toks = F.split(F.trim(F.col(text_col)), TOKEN_RE)
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    out = (
        df.withColumn("n_chars_m", F.length(text_col))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("mean_word_len", F.col("n_chars_m") / F.greatest(F.col("n_tokens"), F.lit(1)))
        .withColumn("alpha_ratio", alpha / F.greatest(F.length(text_col), F.lit(1)))
        .withColumn(
            "stopword_ratio",
            F.size(F.array_intersect(F.array_distinct(toks), sw))
            / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)),
        )
        .withColumn(
            "quality",
            F.round(
                F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
                + F.col("alpha_ratio") * 0.4
                + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2,
                6,
            ),
        )
    )
    return out


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic: argmax over per-language
    distinct-token intersection counts; 'und' (undetermined) when all 0."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), TOKEN_RE))
    d = df.withColumn("_toks", toks)
    scores = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(F.col("_toks"), F.array([F.lit(w) for w in ws]))).alias("s"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(scores)
    return d.withColumn(
        "lang_pred", F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))
    ).drop("_toks")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (cross-engine comparable), plus a winnowed rolling-hash sketch (min
    xxhash64 over word 5-grams — content-defined, shift-tolerant)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    # tokenize once per row: slice({toks}, ...) inside the lambda would
    # re-run the split per 5-gram position (O(tokens^2) splits per doc)
    winnow = (
        "aggregate(transform(sequence(0, greatest(size(_w_fp) - 5, 0)),"
        " i -> xxhash64(concat_ws(' ', slice(_w_fp, i + 1, 5)))),"
        " cast(9223372036854775807 as bigint), (a, x) -> least(a, x))"
    )
    return (
        df.withColumn("_w_fp", F.expr(f"split(lower(trim({text_col})), '\\\\s+')"))
        .withColumn("fingerprint", F.md5(norm))
        .withColumn("winnow_sketch", F.expr(winnow))
        .drop("_w_fp")
    )


def with_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token ratio,
    most-frequent-token fraction, and unigram entropy. Degenerate
    generated text (a token looping, low-entropy boilerplate) scores
    distinctly from natural prose, making these the standard repetition
    filters of an LLM corpus pipeline.

    Entropy folds in one aggregation via H = ln(n) - sum(c*ln(c))/n — no
    second pass or window over the counts.

    Scale shape: explode -> (doc, token) count -> per-doc fold; both
    aggregations are map-side combinable and skew is bounded by document
    length, not corpus size. Returns (id, n_tokens, distinct_ratio,
    top_token_frac, token_entropy)."""
    toks = f"filter(split(lower(trim({text_col})), '\\\\s+'), x -> x != '')"
    t = df.select(id_col, F.explode(F.expr(toks)).alias("token"))
    counts = t.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    n = F.sum("c")
    return counts.groupBy(id_col).agg(
        n.alias("n_tokens"),
        (F.count("*") / n).alias("distinct_ratio"),
        (F.max("c") / n).alias("top_token_frac"),
        (F.log(n) - F.sum(F.col("c") * F.log("c")) / n).alias("token_entropy"),
    )


# PII patterns kept to the regex subset Java (Spark) and RE2 (DuckDB)
# evaluate identically: no backreferences, no lookaround, greedy
# quantifiers only — so the DuckDB oracle is bit-for-bit comparable.
# Ordered: emails redact first (an IP-shaped local part like
# 10.0.0.1@example.com must become one [EMAIL], not [IPV4]@example.com).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+\d{2}-\d{3}-\d{4,6}\b"),
)


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII match counts (n_email, n_ipv4, n_phone) — one
    codegen'd Project, no shuffle, no Python."""
    for name, pat in PII_PATTERNS:
        df = df.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
    return df


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Replace every PII match with its [TYPE] placeholder, in
    PII_PATTERNS order (emails before IPs — see module comment)."""
    col = F.col(text_col)
    for name, pat in PII_PATTERNS:
        col = F.regexp_replace(col, pat, f"[{name.upper()}]")
    return df.withColumn(out_col, col)


# URL pattern in the same Java/RE2-shared subset as PII_PATTERNS.
URL_RE = r"https?://[A-Za-z0-9.-]+(?::\d+)?(?:/[^\s]*)?"


def with_urls(df: DataFrame, text_col: str = "text", out_col: str = "urls") -> DataFrame:
    """All http(s) URLs per doc as an array column — one codegen'd
    Project, no shuffle."""
    return df.withColumn(
        out_col, F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
    )


def domain_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-registrable-domain corpus stats — the web-pipeline primitive
    behind domain blocklists and per-domain quality weighting: (domain,
    n_urls, n_docs). Domain = last two host labels, lowercased (the
    public-suffix-list refinement is a broadcast-join swap at the same
    spot). One explode + one map-side-combinable agg keyed by domain;
    domain skew (half the web is a handful of hosts) stays safe because
    both aggregates are partial — a hot domain combines per task before
    the single exchange."""
    host = F.regexp_extract(F.col("url"), r"https?://([A-Za-z0-9.-]+)", 1)
    return (
        with_urls(df.select(id_col, text_col), text_col)
        .select(id_col, F.explode("urls").alias("url"))
        .withColumn(
            "domain",
            F.lower(F.array_join(F.slice(F.split(host, r"\."), -2, 2), ".")),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )


def filter_cascade(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_top_token_frac: float = 0.15,
    min_alpha: float = 0.81,
    allowed_langs: tuple = ("en",),
) -> DataFrame:
    """C4/Gopher-style quality cascade: every doc gets a keep/drop verdict
    plus the FIRST failing rule as its reject reason (too_short ->
    repetitive -> low_alpha -> lang -> ok). Signals reuse with_quality,
    with_repetition_stats, and with_lang_id; every comparison is an
    exact-integer division against a shared literal, so the verdict is
    deterministic cross-engine. Scale shape: one codegen'd Project for
    the row-local signals + the repetition partial agg, joined back on
    id_col (both sides shuffle once on the id)."""
    sig = with_lang_id(with_quality(df.select(id_col, text_col)))
    rep = with_repetition_stats(df.select(id_col, text_col), id_col, text_col).select(
        id_col, "top_token_frac"
    )
    j = sig.join(rep, id_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("top_token_frac") > max_top_token_frac, F.lit("repetitive"))
        .when(F.col("alpha_ratio") < min_alpha, F.lit("low_alpha"))
        .when(~F.col("lang_pred").isin(*allowed_langs), F.lit("lang"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        id_col, reason.alias("reason"), (reason == "ok").alias("keep")
    )


# tracking params stripped by canonical_url; the trailing '&?' eats the
# separator of a following param so '?utm_x=1&a=2' folds to '?a=2'
TRACKING_PARAM_RE = "(utm_[A-Za-z_]+|fbclid)=[^&#]*&?"


def canonical_url(url):
    """Canonical URL form for exact URL dedup, byte-identical to the
    DuckDB oracle chain (Java regexp_replace is replace-ALL; the oracle
    passes the 'g' flag where that matters):

      1. scheme folded to https (http/https are the same resource)
      2. host lowercased, leading 'www.' and default ports :80/:443 gone
      3. fragment stripped (never sent to the server)
      4. utm_*/fbclid tracking params dropped, dangling '?'/'&' repaired
      5. one trailing slash stripped

    All JVM regex built-ins on one column — a codegen'd Project, no
    Python, no shuffle; the dedup groupBy downstream is the only wide
    stage."""
    rest = F.regexp_replace(url, "^https?://", "")
    host = F.lower(F.regexp_extract(rest, "^[^/?#]+", 0))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    tail = F.regexp_replace(rest, "^[^/?#]+", "")
    tail = F.regexp_replace(tail, "#.*$", "")
    tail = F.regexp_replace(tail, TRACKING_PARAM_RE, "")
    tail = F.regexp_replace(tail, "[?&]$", "")
    tail = F.regexp_replace(tail, "/$", "")
    return F.concat(F.lit("https://"), host, tail)


def url_dedup_groups(df: DataFrame, id_col: str = "doc_id", url_col: str = "url") -> DataFrame:
    """Exact URL dedup after canonicalization: (canon_url, n_urls,
    n_docs). The scheme/www/port/tracking noise that makes byte-equal
    dedup miss real duplicates folds out in the Project; the single
    groupBy is map-side combinable, so hot URLs (link farms) combine per
    task before the one exchange."""
    return (
        df.select(id_col, canonical_url(F.col(url_col)).alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.count("*").alias("n_urls"), F.countDistinct(id_col).alias("n_docs"))
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Robust winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
    fingerprint): hash every word k-gram, slide a window of w consecutive
    hashes, record the minimum of each window (rightmost position on
    ties), and emit the distinct selected (position, hash) pairs. Any
    shared substring of >= w+k-1 words between two documents is then
    guaranteed to share a fingerprint — the contract exact shingle
    sampling (every-nth) does not give.

    Cross-engine trick: the "min hash, ties -> max position" selection is
    packed into ONE orderable BIGINT — key = (hash mod 2^40) * 2^20 +
    (2^20-1-pos) — so a plain window MIN implements the argmin on both
    engines bit-identically (positions are bounded by the 2^20 pack;
    the 2^40 fold keeps the product inside int64).

    Scale shape: posexplode fans each doc to ~n_tokens rows, the only
    shuffle is the per-document window partition (bounded partitions —
    one doc each), and the hash is the JVM char-fold expression (no
    Python). Short documents with fewer than w k-grams still emit their
    global minimum (the `pos = maxpos` branch), matching the paper's
    definition on short inputs.
    """
    from .hashing import char_fold_spark

    grams = (
        f"transform(sequence(0, greatest(size(_w_wn) - {k}, 0)), "
        f"i -> concat_ws(' ', slice(_w_wn, i + 1, {k})))"
    )
    # tokenize once per row (see with_fingerprints note)
    g = df.withColumn(
        "_w_wn", F.expr(f"split(lower(trim({text_col})), '\\\\s+')")
    ).select(
        F.col(id_col),
        F.expr(f"greatest(size(_w_wn) - {k}, 0)").alias("_maxpos"),
        F.posexplode(F.expr(grams)).alias("_pos", "_gram"),
    )
    key = f"(({char_fold_spark('_gram')}) % 1099511627776) * 1048576 + (1048575 - _pos)"
    win = (
        Window.partitionBy(id_col).orderBy("_pos").rowsBetween(-(w - 1), 0)
    )
    sel = (
        g.withColumn("_key", F.expr(key))
        .withColumn("_selkey", F.min("_key").over(win))
        .where((F.col("_pos") >= w - 1) | (F.col("_pos") == F.col("_maxpos")))
    )
    return sel.select(
        F.col(id_col),
        (F.lit(1048575) - F.col("_selkey") % 1048576).cast("long").alias("fp_pos"),
        F.expr("_selkey div 1048576").cast("long").alias("fp_hash"),
    ).distinct()


#: seeded literal weights for the hashed-bag-of-words quality classifier —
#: the stand-in for a trained fastText/logistic quality model's weight
#: vector (the serving plumbing is what matters here; swap real weights in
#: without touching the plan shape).
CLASSIFIER_BUCKETS = 64
CLASSIFIER_SEED = 20260818


def classifier_weights() -> "list[float]":
    import numpy as np

    rng = np.random.default_rng(CLASSIFIER_SEED)
    return [round(float(x), 4) for x in rng.standard_normal(CLASSIFIER_BUCKETS)]


def classifier_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Model-based quality filtering, fastText-style (Joulin et al. 2016;
    the CCNet/GPT-3 quality-classifier stage): each token hashes into one
    of B weight buckets, the document score is the mean bucket weight,
    and the keep/drop label thresholds the score at 0. Weights here are
    seeded literals standing in for a trained model (see
    `classifier_weights`) — the point is the serving shape: the entire
    classifier is ONE JVM expression (transform + element_at + aggregate
    fold over a literal array), pure Project, zero shuffles, zero Python,
    so it runs at scan speed over 100 TB. The DuckDB oracle re-derives
    the identical score from the same literals (same left-to-right float
    fold -> bit-equal at 6 dp)."""
    from .hashing import char_fold_spark

    wlit = "array(" + ", ".join(repr(x) for x in classifier_weights()) + ")"
    toks = f"split(lower(trim({text_col})), '\\\\s+')"
    fold = char_fold_spark("t")
    score = (
        f"round(aggregate(transform({toks}, "
        f"t -> element_at({wlit}, cast(({fold}) % {CLASSIFIER_BUCKETS} as int) + 1)), "
        f"0.0D, (a, x) -> a + x) / size({toks}), 6)"
    )
    return df.select(
        F.col(id_col),
        F.expr(score).alias("score"),
        F.expr(f"CASE WHEN {score} >= 0 THEN 'keep' ELSE 'drop' END").alias("label"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top: int = 20,
) -> DataFrame:
    """Corpus-level boilerplate detection (the C4/RefinedWeb pass that
    strips lines/phrases recurring across many pages): rank word n-grams
    by DOCUMENT frequency — distinct per doc, so a phrase repeated inside
    one page counts once — and return the top offenders with their
    corpus ratio. Downstream, the returned set joins back as a removal
    or down-weight list.

    Scale shape: one map-side-combinable count per distinct (doc, gram)
    -> one partial-agg exchange on gram; the total-docs denominator is a
    one-row frame broadcast back (no second scan barrier); top-k is
    TakeOrderedAndProject (no global sort materialization). Determinism:
    ties at the k-boundary break on the gram string."""
    from .dedup import word_shingles

    grams = word_shingles(df.select(id_col, text_col), text_col, n=n, out="gram")
    freq = grams.groupBy("gram").agg(F.count("*").alias("doc_freq"))
    total = df.select(F.count("*").alias("_total"))
    return (
        freq.crossJoin(F.broadcast(total))
        .select(
            "gram",
            "doc_freq",
            F.round(F.col("doc_freq") / F.col("_total"), 6).alias("doc_ratio"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("gram").asc())
        .limit(top)
    )


def token_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Word-unigram entropy + type-token ratio per document — the
    lexical-diversity quality signals (low entropy == repetitive/spammy
    text; the Gopher-style repetition family's information-theoretic
    cousin). Uses the single-aggregation identity
    H = log2(n) - sum(c*log2(c))/n, so the whole op is explode ->
    ONE (doc, token) partial agg -> ONE doc partial agg — two
    map-side-combinable exchanges, no window, no second corpus scan.
    Rounded to 6 dp (cross-engine summation-order noise is ~1e-15)."""
    t = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_tok"),
    )
    tf = t.groupBy(id_col, "_tok").agg(F.count("*").alias("_c"))
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum(F.col("_c") * F.log2("_c")).alias("_sclc"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_types").cast("long").alias("n_types"),
            F.round(F.log2("n_tokens") - F.col("_sclc") / F.col("n_tokens"), 6).alias("entropy"),
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        )
    )


def bpe_merges(df: DataFrame, text_col: str = "text", n_merges: int = 6) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. ACL 2016 —
    the GPT-2/LLaMA vocabulary-induction algorithm): learn the top
    `n_merges` byte-pair merges over the corpus. Returns the merge table
    (rank, l_sym, r_sym, merged, pair_cnt) — the artifact a tokenizer
    ships.

    Sparkified the way you'd actually train at 100 TB: the ONLY
    corpus-scale operation is the initial word-frequency aggregation
    (one scan, map-side combinable); every merge iteration then runs on
    the VOCABULARY table (distinct words x counts — millions of rows at
    web scale, not trillions). Per iteration: one pair-count partial agg
    + a 1-row argmax collect (the merge decision IS driver state — this
    is the canonical structure, not a collect anti-pattern), then the
    merge applies as a pure JVM `aggregate` fold that rebuilds each
    token list greedily left-to-right — the exact BPE application rule,
    including runs ('a a a a' + merge(a,a) -> [aa, aa]).

    Ties break (pair_cnt DESC, l_sym, r_sym) so the learned sequence is
    deterministic; the DuckDB oracle re-derives the SAME merges from
    scratch (chained CTEs with a list_reduce fold), so the entire
    training trajectory is value-checked, not just the final table."""
    spark = df.sparkSession
    wc = (
        df.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    toks = "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    wf = wc.select(F.expr(toks).alias("toks"), "cnt").localCheckpoint(eager=False)

    def q(s: str) -> str:
        return s.replace("'", "''")

    pairs_expr = (
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) as l, element_at(toks, i + 1) as r))"
    )
    merges = []
    for rank in range(1, n_merges + 1):
        top = (
            wf.where(F.expr("size(toks) > 1"))
            .select(F.explode(F.expr(pairs_expr)).alias("p"), "cnt")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pair_cnt"))
            .orderBy(F.col("pair_cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        b = top[0]
        merged = b.l + b.r
        merges.append((rank, b.l, b.r, merged, int(b.pair_cnt)))
        fold = (
            f"aggregate(slice(toks, 2, size(toks) - 1), array(element_at(toks, 1)), "
            f"(acc, x) -> CASE WHEN element_at(acc, size(acc)) = '{q(b.l)}' AND x = '{q(b.r)}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{q(merged)}')) "
            f"ELSE concat(acc, array(x)) END)"
        )
        wf = wf.select(F.expr(fold).alias("toks"), "cnt").localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank int, l_sym string, r_sym string, merged string, pair_cnt long"
    )


def bpe_train_batched(
    df: DataFrame, text_col: str = "text", n_merges: int = 6, batch: int = 3
) -> DataFrame:
    """Batched-recount BPE training (r4 VERDICT item 4): the production
    fix for `bpe_merges`' one-driver-round-trip-per-merge shape — a real
    32k-merge tokenizer run cannot afford 32k corpus-frame round trips.
    Each ROUND runs ONE pair-count job with ONE bounded top-(4*batch)
    collect, greedily selects up to `batch` SYMBOL-DISJOINT merges (a
    candidate is skipped when its left or right symbol already appears
    in a pair selected this round), then applies the selected merges as
    chained in-plan greedy folds — the next round's pair-count action
    executes them all in a single job. Driver round-trips drop from
    n_merges to ceil(n_merges / batch).

    Approximation contract (the documented batched trade-off): the
    learned trajectory equals exact BPE whenever each round's selected
    pairs are pairwise independent — the disjointness rule makes
    intra-round interference impossible, but a corpus where a higher
    merge WOULD have changed a lower candidate's count before its turn
    can diverge from the exact sequence. `bpe_merges` (same module)
    stays the oracle-locked exact reference; the bpe_train_batched query
    compares both trajectories on a fixture where they provably agree.
    Returns the same merge-table schema."""
    spark = df.sparkSession
    wc = (
        df.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    toks = "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    wf = wc.select(F.expr(toks).alias("toks"), "cnt").localCheckpoint(eager=False)

    def q(s: str) -> str:
        return s.replace("'", "''")

    pairs_expr = (
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) as l, element_at(toks, i + 1) as r))"
    )
    merges: list[tuple] = []
    while len(merges) < n_merges:
        k = min(batch, n_merges - len(merges))
        top = (
            wf.where(F.expr("size(toks) > 1"))
            .select(F.explode(F.expr(pairs_expr)).alias("p"), "cnt")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pair_cnt"))
            .orderBy(F.col("pair_cnt").desc(), "l", "r")
            .limit(4 * batch)
            .collect()
        )
        if not top:
            break
        used: set[str] = set()
        selected = []
        for b in top:
            if len(selected) == k:
                break
            if b.l in used or b.r in used:
                continue
            selected.append(b)
            used.update((b.l, b.r))
        for b in selected:
            merged = b.l + b.r
            merges.append((len(merges) + 1, b.l, b.r, merged, int(b.pair_cnt)))
            fold = (
                f"aggregate(slice(toks, 2, size(toks) - 1), array(element_at(toks, 1)), "
                f"(acc, x) -> CASE WHEN element_at(acc, size(acc)) = '{q(b.l)}' AND x = '{q(b.r)}' "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array('{q(merged)}')) "
                f"ELSE concat(acc, array(x)) END)"
            )
            # plan chaining only — no action, no checkpoint: the batch's
            # folds run together inside the next round's pair-count job
            wf = wf.select(F.expr(fold).alias("toks"), "cnt")
        wf = wf.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank int, l_sym string, r_sym string, merged string, pair_cnt long"
    )


def corpus_zipf(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus diagnostics: vocabulary size, total tokens, the
    Zipf rank-frequency slope (least-squares fit of ln(freq) on
    ln(rank); healthy natural-language corpora sit near -1, spam/
    boilerplate-heavy corpora flatten), and the top token. The standard
    pre-training corpus health check.

    Scale shape: ONE corpus-scale token count (map-side combinable);
    the ranking window and the closed-form slope
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) then run over the VOCABULARY frame
    — bounded by distinct-token count, not corpus size (the documented
    B-row single-partition window, same policy as sampling.py)."""
    tf = (
        df.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    r = tf.withColumn("rank", F.row_number().over(w)).select(
        "tok", "freq", "rank", F.log("rank").alias("x"), F.log("freq").alias("y")
    )
    return r.agg(
        F.count("*").alias("vocab_size"),
        F.sum("freq").alias("total_tokens"),
        F.round(
            (F.count("*") * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (F.count("*") * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            6,
        ).alias("zipf_slope"),
        F.max(F.when(F.col("rank") == 1, F.col("tok"))).alias("top_token"),
        F.max(F.when(F.col("rank") == 1, F.col("freq"))).alias("top_freq"),
        # hapax share of the VOCABULARY: high -> OCR noise / random junk
        # tokens; near-zero -> template/boilerplate corpus
        F.round(
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)) / F.count("*"), 6
        ).alias("hapax_ratio"),
    )


def bpe_encode(
    df: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge list to the corpus (the ENCODE half of
    the tokenizer pipeline; bpe_merges/bpe_train_batched are the TRAIN
    half): each word becomes its character sequence, then the merges
    apply in priority order — merge k fires everywhere it occurs before
    merge k+1 is considered, the greedy rank-order application of
    Sennrich et al. 2016 §3.2 (leftmost-first exhaustive application of
    one pair equals a single left-to-right non-overlapping replace pass,
    which is exactly `replace`'s semantics in both engines).

    The whole encoder is ONE codegen'd JVM Project: a replace chain of
    length len(merges) inside a per-word `transform`. That is the right
    shape for a bounded merge list (the chain is compiled once, rows
    stream through it with zero Python and zero shuffles); a
    production 32k-merge vocabulary instead ships the merge table to an
    Arrow-batched kernel (the ops.multimodal pattern) — the plan shape
    below is the small-vocab fast path, not the 32k claim.

    Returns (id, n_words, n_bpe_tokens, encoded_hash) — encoded_hash is
    the md5 of the full token stream ('|' between words) so the encoding
    is value-checked byte-for-byte without shipping every token through
    the compare.
    """
    merges = merges if merges is not None else DEFAULT_BPE_MERGES
    chars = "array_join(filter(split(w, ''), c -> c <> ''), ' ')"
    enc = chars
    for a, b in merges:
        enc = f"replace({enc}, '{a} {b}', '{a}{b}')"
    words = f"filter(split(lower({text_col}), '[^a-z]+'), x -> x <> '')"
    return df.selectExpr(
        f"{id_col} as id",
        f"cast(size({words}) as bigint) as n_words",
        f"cast(aggregate(transform({words}, w -> {enc}), 0, "
        "(acc, e) -> acc + size(split(e, ' '))) as bigint) as n_bpe_tokens",
        f"md5(array_join(transform({words}, w -> {enc}), ' | ')) as encoded_hash",
    )


#: a small English-ish merge list that actually fires on common words —
#: the canned vocabulary for the oracled encode query (a real deployment
#: passes the `merges` output of bpe_merges/bpe_train_batched)
DEFAULT_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("e", "r"), ("o", "r"), ("or", "d"),
    ("a", "n"), ("s", "t"), ("i", "n"), ("o", "w"), ("a", "t"),
]


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Sliding-window document chunking — the splitter in front of an
    embedding/RAG indexing pipeline: token windows of `window` tokens
    advancing by `stride` (overlap = window - stride), the last window
    truncated, no windows for token-less docs, and a chunk never starts
    past the end. Chunk count for n tokens = ceil(max(n - window, 0) /
    stride) + 1.

    One codegen'd Project + posexplode — the fan-out is data-proportional
    (n/stride chunks per doc) and partition-local, so the operator adds
    zero shuffles; downstream embedding kernels see (id, chunk_idx,
    chunk_text) rows already spread across the scan's partitions.
    """
    w, s = int(window), int(stride)
    toks = f"filter(split({text_col}, ' '), x -> x <> '')"
    # tokenize once per row: slice({toks}, ...) inside the lambda would
    # re-split per chunk (O(tokens^2/stride) splits per doc)
    n_chunks = f"(int(ceil(greatest(size(_w_cw) - {w}, 0) / {s}.0)) + 1)"
    return (
        df.withColumn("_w_cw", F.expr(toks))
        .where(F.expr("size(_w_cw) > 0"))
        .selectExpr(
            f"{id_col} as id",
            f"""posexplode(transform(sequence(0, {n_chunks} - 1),
                 i -> array_join(slice(_w_cw, i * {s} + 1, {w}), ' ')
               )) as (chunk_idx, chunk_text)""",
        )
        .selectExpr(
            "id",
            "chunk_idx",
            "cast(size(split(chunk_text, ' ')) as bigint) as n_chunk_tokens",
            "chunk_text",
        )
    )


def feature_hash_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 64,
) -> DataFrame:
    """Feature hashing / the hashing trick (Weinberger et al. 2009): an
    embedding-free bag-of-words vectorizer — every token lands in
    dimension h(token) mod dims with a second-hash sign (+/-1, the
    unbiasedness device of §3), counts accumulate. The bridge from raw
    text to the emb_*/ann_*/kmeans_* family when no learned embedding
    model is available. Emitted FLAT as (id, dim, value) rows for
    engine-exact comparison; zero-valued dims are omitted (sparse).

    Scale shape: explode tokens partition-locally, hash with the shared
    cross-engine char fold (ops.hashing), then ONE (id, dim)-keyed
    map-side-combinable sum. No vocabulary table, no broadcast, no
    second corpus pass — the property that makes the hashing trick the
    standard streaming vectorizer.
    """
    from .hashing import char_fold_spark

    h = char_fold_spark("tok")
    toks = f"filter(split(lower({text_col}), '[^a-z]+'), x -> x <> '')"
    e = df.selectExpr(f"{id_col} as id", f"explode({toks}) as tok").selectExpr(
        "id",
        f"cast(pmod({h}, {dims}) as int) as dim",
        # sign from the fold shifted once more (an independent-enough
        # second hash under the same modulus)
        f"cast(1 - 2 * pmod({h} * 31 + 7, 2) as bigint) as sign",
    )
    return (
        e.groupBy("id", "dim")
        .agg(F.sum("sign").alias("value"))
        .where(F.col("value") != 0)
    )


def dsir_weights(
    df: DataFrame,
    target_filter: str = "lang = 'en'",
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 64,
) -> DataFrame:
    """DSIR importance-resampling log-weights (Xie et al., NeurIPS 2023):
    score every raw document by how target-like its hashed-unigram bag
    is — log w(doc) = sum_f c_f(doc) * ln(p_f / q_f), where p is the
    Laplace-smoothed hashed-feature distribution of the rows matching
    `target_filter` and q that of the full corpus. Feed `logw` into
    weighted/Gumbel top-k sampling to resample raw data toward the
    target domain (the DSIR pipeline's select step).

    Scale shape: ONE token explode (partition-local, shared cross-engine
    char fold) feeds both the `dims`-row global distributions
    (conditional partial aggs -> a one-row total broadcast back) and the
    per-doc (id, dim) counts; the log-ratio table re-attaches with a
    broadcast join on dim. No vocabulary table, no second corpus pass,
    no driver loop."""
    from .hashing import char_fold_spark

    h = char_fold_spark("tok")
    toks = f"filter(split(lower({text_col}), '[^a-z]+'), x -> x <> '')"
    e = df.selectExpr(
        f"{id_col} as id", f"({target_filter}) as is_t", f"explode({toks}) as tok"
    ).selectExpr("id", "is_t", f"cast(pmod({h}, {dims}) as int) as dim")
    dist = e.groupBy("dim").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.count("*").alias("cr"),
    )
    tot = dist.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    sm = dims * 0.5
    # 0.5D / {sm}D: force DOUBLE literals — Spark parses bare decimal
    # literals as DECIMAL, and decimal division would truncate the ratio
    # at a scale the DuckDB oracle (double arithmetic) doesn't
    lr = dist.crossJoin(F.broadcast(tot)).selectExpr(
        "dim",
        f"ln(((ct + 0.5D) / (tt + {sm}D)) / ((cr + 0.5D) / (tr + {sm}D))) as lr",
    )
    percount = e.groupBy("id", "dim").agg(F.count("*").alias("c"))
    return (
        percount.join(F.broadcast(lr), "dim")
        .groupBy("id")
        .agg(
            F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("logw"),
            F.sum("c").cast("long").alias("n_toks"),
        )
    )


def rouge_l(
    cands: DataFrame,
    refs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_id_col: str = "eval_id",
    ref_text_col: str = "text",
    max_tokens: int = 30,
) -> DataFrame:
    """ROUGE-L overlap of every candidate document against every
    reference (eval-set) document: token-level longest common
    SUBSEQUENCE, reported as precision / recall / F1 (Lin 2004) — the
    contamination measure n-gram containment misses (an eval answer
    paraphrased with insertions still scores high on LCS while sharing
    few contiguous n-grams; complements ops.dedup.decontaminate).

    The whole LCS dynamic program is ONE nested JVM HOF expression: the
    outer `aggregate` folds candidate tokens carrying the DP row, the
    inner `aggregate` builds the next row left-to-right (the running
    accumulator supplies new[j-1], the carried row supplies old[j-1] /
    old[j]). No Python touches a row, and the DP is pure int arithmetic
    — bit-identical on any engine, so the oracle replays it exactly via
    a recursive CTE. Token streams cap at `max_tokens` so the per-pair
    work is a fixed O(max_tokens^2) expression the optimizer treats as
    a Project.

    Scale shape: refs is an EVAL SET — bounded and small by definition
    — so the candidate x ref pairing is a broadcast nested loop over a
    dimension of known size (the decontaminate pattern), never a
    corpus x corpus explosion. One Project, zero shuffles."""
    tok = (
        f"slice(split(lower(trim({{c}})), '\\\\s+'), 1, {max_tokens})"
    )
    c = cands.select(F.col(id_col), F.expr(tok.format(c=text_col)).alias("_ta"))
    r = refs.select(
        F.col(ref_id_col), F.expr(tok.format(c=ref_text_col)).alias("_tb")
    )
    dp = (
        "aggregate(_ta, array_repeat(0, size(_tb) + 1), "
        "(row, at) -> aggregate(sequence(1, size(_tb)), array(0), "
        "(acc, j) -> array_append(acc, greatest("
        "IF(at = element_at(_tb, j), element_at(row, j) + 1, element_at(row, j + 1)), "
        "element_at(acc, j)))))"
    )
    scored = c.crossJoin(F.broadcast(r)).withColumn(
        "lcs", F.expr(f"element_at({dp}, size(_tb) + 1)").cast("long")
    )
    p = F.col("lcs") / F.size("_ta")
    rr = F.col("lcs") / F.size("_tb")
    return scored.select(
        id_col,
        ref_id_col,
        "lcs",
        F.round(p, 6).alias("rouge_p"),
        F.round(rr, 6).alias("rouge_r"),
        F.when(F.col("lcs") == 0, F.lit(0.0))
        .otherwise(F.round(2 * p * rr / (p + rr), 6))
        .alias("rouge_f"),
    )


#: Default content blocklist for `blocklist_hits` — drawn from the synth
#: corpus vocabulary so every rule is observed firing at test scale; a
#: production run swaps in a UT1/badwords-style list of tens of
#: thousands of terms (the plan shape — broadcast join against exploded
#: tokens — is sized for that, not for this demo list).
BLOCKLIST_TERMS = ("slow", "dup", "leak", "skew")


def blocklist_hits(
    df: DataFrame,
    terms=BLOCKLIST_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_frac: float = 0.05,
) -> DataFrame:
    """Blocklist term matching — the badwords/URL-blocklist gate every
    web-corpus pipeline runs before quality filtering (C4's banned-word
    list, RefinedWeb's UT1 categories). Per doc: total blocked-token
    occurrences, distinct blocked terms seen, the blocked fraction of
    tokens, and the flag verdict (frac > `flag_frac`).

    Plan shape for a 10k-term production list: ONE corpus pass — the
    tokens explode WITH the doc spine (explode_outer keeps token-less
    docs), the blocklist attaches as a broadcast LEFT hash join marker
    (never a per-row `isin` literal that would bloat the plan, never a
    regex alternation that defeats codegen), and everything folds in a
    single map-side-combinable per-doc aggregate. ONE shuffle total,
    zero Python, no doc-spine re-join."""
    spark = df.sparkSession
    toks = f"filter(split(lower({text_col}), '[^a-z]+'), x -> x <> '')"
    tok = df.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("_n_tokens"),
        F.explode_outer(F.expr(toks)).alias("tok"),
    )
    bl = spark.createDataFrame([(t, 1) for t in terms], ["tok", "_hit"])
    return (
        tok.join(F.broadcast(bl), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.max("_n_tokens").alias("n_tokens"),
            F.count("_hit").alias("n_hits"),
            F.countDistinct(
                F.when(F.col("_hit").isNotNull(), F.col("tok"))
            ).alias("n_hit_terms"),
        )
        .select(
            id_col,
            "n_tokens",
            F.col("n_hits").cast("bigint").alias("n_hits"),
            F.col("n_hit_terms").cast("bigint").alias("n_hit_terms"),
            F.round(
                F.col("n_hits") / F.greatest("n_tokens", F.lit(1)), 6
            ).alias("hit_frac"),
        )
        .withColumn("flagged", (F.col("hit_frac") > flag_frac).cast("int"))
    )


RAKE_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "on",
    "for", "with", "at", "by", "from",
)


def rake_word_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    min_freq: int = 5,
) -> DataFrame:
    """RAKE keyword scores (Rose et al. 2010): split each doc into
    candidate phrases at stopword boundaries, then score every content
    word by degree/frequency — deg(w) sums the length of each phrase w
    occurs in (co-occurrence degree incl. self), freq(w) counts the
    occurrences. High scores mark words living in long multi-word
    phrases — the phrase-level keyword extractor complementing tf-idf
    (corpus-frequency) and chi2 (label-association) scoring.

    Shape: posexplode -> per-doc cumulative-stopword window assigns the
    phrase (island) id -> per-(doc, island) count window gives phrase
    length -> ONE word-keyed partial agg. Two window passes share the
    doc-keyed shuffle; no joins, no Python. Returns
    (word, freq, deg, score), freq >= min_freq.
    """
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "_pos", "_w"
        ),
    )
    t2 = toks.withColumn("_stop", F.col("_w").isin(*stopwords).cast("int"))
    island = F.sum("_stop").over(Window.partitionBy("_d").orderBy("_pos"))
    nz = t2.withColumn("_isl", island).where(F.col("_stop") == 0)
    plen = F.count("*").over(Window.partitionBy("_d", "_isl"))
    occ = nz.withColumn("_plen", plen)
    return (
        occ.groupBy(F.col("_w").alias("word"))
        .agg(F.count("*").alias("freq"), F.sum("_plen").alias("deg"))
        .where(F.col("freq") >= min_freq)
        .select(
            "word",
            "freq",
            F.col("deg").cast("long").alias("deg"),
            (F.col("deg").cast("double") / F.col("freq")).alias("score"),
        )
    )
