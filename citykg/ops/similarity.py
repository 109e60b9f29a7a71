"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set, JVM-side dot product via zip_with/aggregate, per-query top-k
  with a window. One pass over the corpus, no shuffle of the corpus.
* LSH-bucketed ANN — random-hyperplane sign buckets (deterministic
  numpy matmul in one Arrow batch pass), candidates = same bucket in any
  of `tables` hash tables, then exact cosine re-rank. The 100 TB path:
  corpus hashed once and bucket-partitioned; a query touches
  tables x 1 buckets instead of every row.
* IVF — coarse quantizer from a deterministic sample (k-means++ style
  seeding without iteration), nprobe nearest centroids searched. Same
  re-rank. Trades recall for a corpus partition pruning factor of
  ~n_centroids/nprobe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def with_norm(df: DataFrame, vec_col: str, out: str = "_norm") -> DataFrame:
    return df.withColumn(
        out, F.expr(f"sqrt(aggregate({vec_col}, 0.0D, (a, x) -> a + double(x) * double(x)))")
    )


def cosine_expr(va: str, vb: str, na: str, nb: str):
    dot = f"aggregate(zip_with({va}, {vb}, (x, y) -> double(x) * double(y)), 0.0D, (a, x) -> a + x)"
    return F.expr(f"{dot} / ({na} * {nb})")


def with_quantized(
    df: DataFrame, vec_col: str = "embedding", out: str = "q8", scale_out: str = "q8_scale"
) -> DataFrame:
    """Symmetric int8 quantization per vector: q = round_half_up(x * 127 /
    max|x|), stored with its scale so dot products reconstruct as
    (qa.qb) * sa * sb / 127^2. Cuts embedding storage and shuffle bytes 4x
    — at 100 TB the ANN candidate join is bandwidth-bound, so the
    quantized column is what ships; the float column stays for exact
    re-ranking. All-zero vectors quantize to zeros with scale 0. Pure JVM
    expressions; round-half-up via floor(v + 0.5) is engine-exact, so the
    DuckDB oracle reproduces the bytes bit-for-bit."""
    mx = f"aggregate({vec_col}, 0.0D, (a, x) -> greatest(a, abs(double(x))))"
    d = df.withColumn(scale_out, F.expr(mx))
    q = (
        f"transform({vec_col}, x -> cast(floor(double(x) * 127.0D / {scale_out} + 0.5D) "
        "as int))"
    )
    return d.withColumn(
        out,
        F.expr(
            f"CASE WHEN {scale_out} = 0.0D THEN transform({vec_col}, x -> 0) ELSE {q} END"
        ),
    )


def with_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    out_dim: int = 16,
    seed: int = 7,
    out: str = "proj",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: y = R x with a seeded
    Gaussian R (out_dim x dim) — the standard embedding-compression step
    before a coarse ANN tier (4x fewer floats to shuffle; pairwise
    distances preserved to ~1/sqrt(out_dim)). One Arrow-batched numpy
    matmul pass, no shuffle, R generated from the seed on every executor
    (deterministic, nothing broadcast). Outputs float64 rounded to 6 so
    the DuckDB oracle (the same R rendered as literal dot products)
    matches after rounding."""
    import numpy as np

    R = _hyperplanes(dim, out_dim, seed)  # reuse the seeded Gaussian rows

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Rm = np.asarray(R)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            res = pdf.copy()
            res[out] = (M @ Rm.T).round(6).tolist()
            yield res

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out} array<double>"
    return df.mapInPandas(project, schema)


def projection_rows(dim: int = 64, out_dim: int = 16, seed: int = 7) -> "list[list[float]]":
    """The projection matrix rows, exposed so an external engine (the
    DuckDB oracle) can re-derive the identical projection."""
    return _hyperplanes(dim, out_dim, seed)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query. queries: (query_id, embedding).
    Output: (query_id, vec_id, cosine, rank)."""
    c = with_norm(corpus.select(id_col, vec_col), vec_col, "_nc")
    q = with_norm(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")), "_qv", "_nq"
    )
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).withColumn(
        "cosine", cosine_expr(vec_col, "_qv", "_nc", "_nq")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> "list[list[float]]":
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    tables: int = 4,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket ids, one per hash table — a single Arrow-batched
    numpy matmul pass (vectorized; no per-row Python)."""
    import numpy as np

    planes = [np.array(_hyperplanes(dim, n_planes, seed + t)) for t in range(tables)]
    cols = df.columns

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            out_rows = {c: pdf[c] for c in cols}
            for t, P in enumerate(planes):
                signs = (M @ P.T) > 0
                out_rows[f"_b{t}"] = (signs.astype(np.uint64) * weights).sum(axis=1).astype("int64")
            yield pd.DataFrame(out_rows)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += ", " + ", ".join(f"_b{t} long" for t in range(tables))
    bucketed = df.mapInPandas(bucketize, schema)
    tbls = ", ".join(
        f"named_struct('table_id', {t}, '{out}', _b{t})" for t in range(tables)
    )
    return (
        bucketed.withColumn("_t", F.explode(F.expr(f"array({tbls})")))
        .select(*cols, F.col("_t.table_id").alias("table_id"), F.col(f"_t.{out}").alias(out))
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 4,
    tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: same-bucket candidates in any table, exact re-rank.

    Bucket granularity scales with corpus size: 2^n_planes buckets per
    table should be ~corpus/1000 at scale (n_planes=4 suits the small
    test corpus; a 10^9-row corpus wants 16-20 planes). Measured on the
    sf0.001 embeddings: (4 planes, 16 tables) -> recall@10 = 0.90,
    (4, 24) -> 0.97."""
    cb = with_lsh_buckets(corpus.select(id_col, vec_col), vec_col, dim, n_planes, tables, seed)
    qb = with_lsh_buckets(
        queries.select(query_id_col, F.col(vec_col).alias("_qv")), "_qv", dim, n_planes, tables, seed
    )
    cands = (
        cb.join(qb, ["table_id", "bucket"])
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, "_qv", id_col, vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    scored = with_norm(with_norm(cands, vec_col, "_nc"), "_qv", "_nq").withColumn(
        "cosine", cosine_expr(vec_col, "_qv", "_nc", "_nq")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_label_col: str = "_qlabel",
    dim: int = 64,
    n_planes: int = 4,
    tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training: for each
    anchor, the k nearest corpus vectors carrying a DIFFERENT label — the
    negatives that sit closest to the decision boundary and therefore
    carry the gradient signal (the ANCE/hard-negative pattern; random
    in-batch negatives are too easy to move a trained retriever).

    Same scale shape as lsh_ann_topk — hard negatives are BY DEFINITION
    near the anchor, which is exactly the case sign-LSH blocking serves:
    same-bucket candidates in any table, label-mismatch filter BEFORE the
    exact cosine re-rank (the filter is an equi-join-side predicate, so
    same-label near-dups never reach the scorer), per-anchor window over
    the bucket-bounded candidate set only. Deterministic tie-break on
    (cosine DESC, id ASC) like every ranker in this package."""
    cb = with_lsh_buckets(
        corpus.select(id_col, vec_col, label_col), vec_col, dim, n_planes, tables, seed
    )
    qb = with_lsh_buckets(
        queries.select(
            query_id_col, F.col(vec_col).alias("_qv"), F.col(query_label_col)
        ),
        "_qv",
        dim,
        n_planes,
        tables,
        seed,
    )
    cands = (
        cb.join(qb, ["table_id", "bucket"])
        .where(
            (F.col(id_col) != F.col(query_id_col))
            & (F.col(label_col) != F.col(query_label_col))
        )
        .select(query_id_col, "_qv", id_col, vec_col, label_col)
        .dropDuplicates([query_id_col, id_col])
    )
    scored = with_norm(with_norm(cands, vec_col, "_nc"), "_qv", "_nq").withColumn(
        "cosine", cosine_expr(vec_col, "_qv", "_nc", "_nq")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, label_col, "cosine", "rank")
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cand: int = 8,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick k results maximizing lambda*rel(q,c) -
    (1-lambda)*max_sim(c, already_selected) — the diversification pass
    retrieval stacks run AFTER the ANN tier so near-duplicate hits
    don't crowd the result list.

    Engine-exact by construction: every cosine quantizes to 1e-4 fixed
    point BEFORE any comparison, and the greedy objective runs in
    scaled INTEGERS (lam_num*rel4 - (lam_den-lam_num)*maxsim4 with
    lambda = lam_num/lam_den), ties broken on id — so the selected
    sequence is a pure function of the quantized scores, with no float
    argmax to drift across engines (the same fixed-point discipline as
    min_cost_supplier / dedup_semantic).

    Scale shape: candidate generation is the ANN tier's job (this op
    re-ranks its bounded output); here the exact top-n_cand per query
    is the contract, queries broadcast, and the k greedy steps are k
    windows over the n_cand-row-per-query frame plus one candidate
    pairwise sim frame of O(n_cand^2) rows per query — all bounded by
    n_cand, never by the corpus."""
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)).cast("int")  # noqa: E731
    c = with_norm(corpus.select(id_col, vec_col), vec_col, "_nc")
    q = with_norm(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")), "_qv", "_nq"
    )
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).withColumn(
        "rel4", q4(cosine_expr(vec_col, "_qv", "_nc", "_nq"))
    )
    wc = Window.partitionBy(query_id_col).orderBy(F.desc("rel4"), F.asc(id_col))
    cand = (
        scored.withColumn("_rn", F.row_number().over(wc))
        .where(F.col("_rn") <= n_cand)
        .select(query_id_col, id_col, "rel4", vec_col, "_nc")
    )
    a = cand.select(
        F.col(query_id_col),
        F.col(id_col).alias("_pa"),
        F.col(vec_col).alias("_va"),
        F.col("_nc").alias("_na"),
    )
    b = cand.select(
        F.col(query_id_col),
        F.col(id_col).alias("_pb"),
        F.col(vec_col).alias("_vb"),
        F.col("_nc").alias("_nb"),
    )
    pairs = (
        a.join(b, query_id_col)
        .where(F.col("_pa") != F.col("_pb"))
        .select(
            query_id_col,
            "_pa",
            "_pb",
            q4(cosine_expr("_va", "_vb", "_na", "_nb")).alias("_sim4"),
        )
    )
    rem = cand.select(query_id_col, id_col, "rel4").withColumn("_ms", F.lit(0))
    mu = lam_den - lam_num
    out = None
    for pos in range(1, k + 1):
        sc = rem.withColumn(
            "_score", (F.lit(lam_num) * F.col("rel4") - F.lit(mu) * F.col("_ms")).cast("long")
        )
        w = Window.partitionBy(query_id_col).orderBy(F.desc("_score"), F.asc(id_col))
        pick = (
            sc.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                query_id_col,
                id_col,
                F.lit(pos).alias("pos"),
                F.col("_score").alias("score_i"),
            )
        )
        out = pick if out is None else out.union(pick)
        psim = pairs.withColumnRenamed(query_id_col, "_qp")
        nxt = (
            rem.join(
                pick.select(query_id_col, F.col(id_col).alias("_pick")), query_id_col
            )
            .where(F.col(id_col) != F.col("_pick"))
            .join(
                psim,
                (F.col("_qp") == F.col(query_id_col))
                & (F.col("_pa") == F.col(id_col))
                & (F.col("_pb") == F.col("_pick")),
                "left",
            )
        )
        rem = nxt.select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("rel4"),
            F.greatest(F.col("_ms"), F.coalesce(F.col("_sim4"), F.lit(0))).alias("_ms"),
        )
    return out


def lsh_range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 4,
    tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Radius (range) search: every corpus vector with cosine >= threshold
    of each query, blocked by the same sign-LSH tables as lsh_ann_topk —
    candidates are same-bucket pairs in ANY table, then exact cosine
    verify. Unlike top-k there is no window: the threshold filter applies
    directly to the verified cosine, so the plan is bucket-join ->
    dropDuplicates -> filter (no per-query sort). At 100 TB the bucket
    join touches tables x |q| buckets, never the full corpus; a query's
    recall at a given threshold follows the same (1-(1-(1-theta/pi)^p)^L)
    collision bound as top-k — choose tables so misses are negligible at
    the target radius (verification strength here: see q_ann_range_search).
    Output: (query_id, vec_id, cosine)."""
    # NARROW bucket join: ids only flow through the explode/join/dedup —
    # the wide vectors attach AFTER the candidate pairs are deduped, so a
    # vector is shuffled once per surviving pair, not once per bucket
    # collision (same trick as minhash_lsh_pairs / embedding_near_dup_lsh)
    cb = with_lsh_buckets(
        corpus.select(id_col, vec_col), vec_col, dim, n_planes, tables, seed
    ).select(id_col, "table_id", "bucket")
    qb = with_lsh_buckets(
        queries.select(query_id_col, F.col(vec_col).alias("_qv")), "_qv", dim, n_planes, tables, seed
    ).select(query_id_col, "table_id", "bucket")
    cands = (
        cb.join(qb, ["table_id", "bucket"])
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    cv = with_norm(corpus.select(id_col, vec_col), vec_col, "_nc")
    qv = with_norm(
        queries.select(query_id_col, F.col(vec_col).alias("_qv")), "_qv", "_nq"
    )
    scored = (
        cands.join(cv, id_col)
        .join(qv, query_id_col)
        .withColumn("cosine", cosine_expr(vec_col, "_qv", "_nc", "_nq"))
    )
    return scored.where(F.col("cosine") >= threshold).select(
        query_id_col, id_col, "cosine"
    )


def ivf_centroids(corpus: DataFrame, vec_col: str = "embedding", n_centroids: int = 16,
                  seed: int = 42, train_sample: int = 4096, iters: int = 10) -> "list[list[float]]":
    """Deterministic coarse-quantizer TRAINING, the faiss pattern: collect
    a hash-ordered sample (train_sample rows — a few MB even against a
    10^12-row corpus; the cluster never shuffles more than the sample),
    run Lloyd k-means on it driver-side in numpy, assign the full corpus
    distributed via with_ivf_cells. Fully deterministic: the sample and
    the seeding both come from the content hash order, argmin ties break
    to the lower centroid id, and the driver-side means add in fixed
    sample order (a distributed mean would sum floats in partition
    order, which varies run-to-run). Empty cells keep their seed."""
    import numpy as np

    rows = (
        corpus.select(vec_col)
        .withColumn("_h", F.xxhash64(F.to_json(F.struct(vec_col)), F.lit(seed)))
        .orderBy("_h")
        .limit(max(train_sample, n_centroids))
        .collect()
    )
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    C = X[: min(n_centroids, len(X))].copy()
    for _ in range(iters):
        d2 = (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
        a = d2.argmin(axis=1)
        for j in range(len(C)):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [list(c) for c in C]


def with_ivf_cells(
    df: DataFrame,
    cents: "list[list[float]]",
    vec_col: str = "embedding",
    n_best: int = 1,
    out: str = "cells",
) -> DataFrame:
    """Appends the `n_best` nearest centroid ids (by squared L2) as an
    int array — one vectorized matmul per Arrow batch against the
    centroid matrix (||x||^2 + ||c||^2 - 2 x.C^T), ties broken by lower
    centroid id (stable argsort). The centroid matrix ships inside the
    serialized kernel (a few MB even at 4096x64), not the query plan."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            d2 = (X * X).sum(axis=1)[:, None] + c2[None, :] - 2.0 * (X @ C.T)
            order = np.argsort(d2, axis=1, kind="stable")[:, :n_best].astype("int32")
            o = {c: pdf[c] for c in cols}
            o[out] = list(order)
            yield pd.DataFrame(o)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema + f", {out} array<int>")


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: assign corpus rows to their nearest centroid with one
    Arrow-batched numpy pass over a broadcast centroid matrix, probe the
    nprobe nearest cells per query. Plan size is O(1) in n_centroids —
    the literal-expression alternative (a CASE/array literal per
    centroid) blows past plan-size limits at n_centroids=4096.
    Assignment rounding is engine-internal only: result exactness comes
    from the exact-cosine re-rank, and the verification setting
    nprobe == n_centroids is assignment-independent by construction."""
    cents = ivf_centroids(corpus, vec_col, n_centroids, seed)

    ca = with_ivf_cells(corpus.select(id_col, vec_col), cents, vec_col, n_best=1).withColumn(
        "cell", F.explode("cells")
    ).drop("cells")
    qa = with_ivf_cells(
        queries.select(query_id_col, F.col(vec_col).alias("_qv")), cents, "_qv", n_best=nprobe
    ).withColumn("cell", F.explode("cells")).drop("cells")
    cands = (
        ca.join(qa, "cell")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, "_qv", id_col, vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    scored = with_norm(with_norm(cands, vec_col, "_nc"), "_qv", "_nq").withColumn(
        "cosine", cosine_expr(vec_col, "_qv", "_nc", "_nq")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


#: product-quantization codebook shape — m subspaces x k seeded centroids
PQ_M = 4
PQ_K = 8
PQ_SEED = 4242


def pq_codebook(dim: int = 64, m: int = PQ_M, k: int = PQ_K, seed: int = PQ_SEED):
    """Seeded literal PQ codebook (m x k x dim/m), rounded to 4 dp so both
    engines consume the exact same decimal literals. Stands in for a
    k-means-trained codebook (swap trained centroids in without touching
    the plan — `ivf_centroids` shows the training pattern)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    sub = dim // m
    return [
        [[round(float(x), 4) for x in rng.standard_normal(sub)] for _ in range(k)]
        for _ in range(m)
    ]


def pq_dist_sql(accessor: str, offset: int, centroid: "list[float]") -> str:
    """Squared L2 distance between vector elements [offset+1 ..] and a
    literal centroid, expanded as an explicit left-to-right `+` chain of
    `(e - c) * (e - c)` terms. Both engines render THIS string (only the
    element `accessor` differs), so the additions execute in the same
    order and the distances are bit-identical — argmin and the rounded
    reconstruction error then agree exactly, not just approximately."""
    terms = []
    for j, c in enumerate(centroid):
        e = accessor.format(i=offset + j + 1)
        terms.append(f"({e} - {c!r}) * ({e} - {c!r})")
    return " + ".join(terms)


def with_pq_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = PQ_M,
    k: int = PQ_K,
    seed: int = PQ_SEED,
) -> DataFrame:
    """Product quantization (Jegou et al. TPAMI 2011, the faiss `PQ`
    index): split each vector into m subvectors, assign each to its
    nearest of k literal centroids, emit the m-byte code plus the total
    squared reconstruction error. Compresses a 64-float embedding to m
    small ints — at 100 TB the ANN candidate shuffle ships codes, not
    floats (16x fewer bytes than int8), with asymmetric-distance rerank
    on the float column afterwards.

    Pure Project, zero Exchange, zero Python: per subspace the k
    distances form one array expression, argmin is
    `array_position(ds, array_min(ds)) - 1` (first-match = lowest index
    on ties, same rule as DuckDB's list_position), and the recon error
    is the sum of the m minima. Distances are bit-identical across
    engines by construction — see `pq_dist_sql`."""
    cb = pq_codebook(dim, m, k, seed)
    sub = dim // m
    acc = f"CAST(element_at({vec_col}, {{i}}) AS DOUBLE)"
    out = df
    for s in range(m):
        dists = "array(" + ", ".join(pq_dist_sql(acc, s * sub, cb[s][j]) for j in range(k)) + ")"
        out = out.withColumn(f"_ds{s}", F.expr(dists))
    code = "array(" + ", ".join(
        f"cast(array_position(_ds{s}, array_min(_ds{s})) - 1 as int)" for s in range(m)
    ) + ")"
    err = " + ".join(f"array_min(_ds{s})" for s in range(m))
    return out.withColumn("pq_code", F.expr(code)).withColumn(
        "recon_err", F.expr(f"round({err}, 6)")
    ).drop(*[f"_ds{s}" for s in range(m)])


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    m: int = PQ_M,
    n_cent: int = PQ_K,
    seed: int = PQ_SEED,
) -> DataFrame:
    """Asymmetric Distance Computation search (Jegou et al. TPAMI 2011
    §IV.A, the faiss `IndexPQ.search` path): the corpus is held ONLY as
    m-byte PQ codes; each query precomputes an m x n_cent table of exact
    subvector->centroid squared distances, and a candidate's approximate
    distance is m table lookups + (m-1) additions — the float corpus is
    never touched at query time. At 100 TB this is the memory-bound
    regime PQ exists for: the scan side of the broadcast join carries
    (id, m-byte code) ≈ 16x less than the int8 column and 64x less than
    the float column, and the per-pair work is integer indexing instead
    of a 64-term dot product.

    Pure Project + one broadcast join + one per-query window — zero
    corpus shuffle. The lookup tables are built from the SAME
    `pq_dist_sql` left-to-right chains as the code assignment, so the
    ADC scores are bit-identical across engines and the ranking is
    exactly reproducible (the DuckDB oracle replays code assignment,
    table build, and lookup verbatim).

    queries: (query_id, vec_col). Output: (query_id, vec_id, rank, adc)
    with adc rounded to 6 dp for display; the rank is computed on the
    unrounded bit-identical sum."""
    cb = pq_codebook(dim, m, n_cent, seed)
    sub = dim // m
    codes = with_pq_codes(corpus, vec_col, dim, m, n_cent, seed).select(
        id_col, "pq_code"
    )
    acc = f"CAST(element_at({vec_col}, {{i}}) AS DOUBLE)"
    qt = queries.select(query_id_col, vec_col)
    for s in range(m):
        arr = "array(" + ", ".join(
            pq_dist_sql(acc, s * sub, cb[s][j]) for j in range(n_cent)
        ) + ")"
        qt = qt.withColumn(f"_qd{s}", F.expr(arr))
    qt = qt.drop(vec_col)
    adc = " + ".join(
        f"element_at(_qd{s}, element_at(pq_code, {s + 1}) + 1)" for s in range(m)
    )
    scored = codes.join(
        F.broadcast(qt), F.col(id_col) != F.col(query_id_col)
    ).withColumn("_adc", F.expr(adc))
    w = Window.partitionBy(query_id_col).orderBy(F.asc("_adc"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "rank", F.expr("round(_adc, 6)").alias("adc")
        )
    )


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 8,
    nprobe: int = 8,
    seed: int = 42,
    dim: int = 64,
    m: int = PQ_M,
    n_cent: int = PQ_K,
    pq_seed: int = PQ_SEED,
) -> DataFrame:
    """IVF-PQ (the faiss IndexIVFPQ architecture, Jegou et al. TPAMI
    2011 §V): the coarse quantizer prunes the corpus to nprobe inverted
    lists, and the survivors are scored by PQ asymmetric distance — the
    composition that actually serves web-scale ANN. This is the 100 TB
    shape end to end: the inverted-list side of the cell join carries
    (id, cell, m-byte code) — never the float vector — so a query reads
    ~nprobe/n_centroids of the corpus and does integer table lookups on
    what it reads; the float column exists only upstream, at index-build
    time (one Arrow-batched cell-assignment pass + one codegen'd code
    Project).

    Corpus rows sit in exactly ONE inverted list (n_best=1), so the cell
    equi-join cannot duplicate a candidate and needs no dedup. At
    nprobe == n_centroids the probed lists cover the corpus and the
    ranking is EXACTLY pq_adc_topk's — the assignment-independent
    verification setting (same argument as ivf_ann_topk); recall at
    nprobe < n_centroids is the production dial, pytest-locked.

    queries: (query_id, vec_col). Output: (query_id, vec_id, rank, adc)."""
    cents = ivf_centroids(corpus, vec_col, n_centroids, seed)
    cb = pq_codebook(dim, m, n_cent, pq_seed)
    sub = dim // m
    ca = (
        with_ivf_cells(
            with_pq_codes(
                corpus.select(id_col, vec_col), vec_col, dim, m, n_cent, pq_seed
            ).select(id_col, vec_col, "pq_code"),
            cents,
            vec_col,
            n_best=1,
        )
        .withColumn("cell", F.explode("cells"))
        .select(id_col, "cell", "pq_code")
    )
    acc = f"CAST(element_at(_qv, {{i}}) AS DOUBLE)"
    qa = with_ivf_cells(
        queries.select(query_id_col, F.col(vec_col).alias("_qv")),
        cents,
        "_qv",
        n_best=min(nprobe, n_centroids),
    ).withColumn("cell", F.explode("cells"))
    for s in range(m):
        arr = "array(" + ", ".join(
            pq_dist_sql(acc, s * sub, cb[s][j]) for j in range(n_cent)
        ) + ")"
        qa = qa.withColumn(f"_qd{s}", F.expr(arr))
    qa = qa.drop("_qv", "cells")
    adc = " + ".join(
        f"element_at(_qd{s}, element_at(pq_code, {s + 1}) + 1)" for s in range(m)
    )
    scored = (
        ca.join(F.broadcast(qa), "cell")
        .where(F.col(id_col) != F.col(query_id_col))
        .withColumn("_adc", F.expr(adc))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("_adc"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "rank", F.expr("round(_adc, 6)").alias("adc")
        )
    )


def emb_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-group embedding centroids (mean pooling) — the seed step for
    k-means-style clustering, per-domain prototype vectors, and SemDeDup
    cell initialisation. Emitted FLAT as one row per (group, dim) so the
    result is hash-comparable across engines without array-column
    equality semantics.

    Scale shape: posexplode fans each vector into (group, dim, value)
    rows partition-locally, then ONE map-side-combinable (group, dim)
    aggregate — the shuffle key space is |groups| x dims, independent of
    corpus size. No collect of vectors, no per-group array reassembly
    unless the caller repacks the (bounded) result."""
    e = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(vec_col).alias("dim", "val"),
    )
    return (
        e.groupBy("grp", "dim")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg(F.col("val").cast("double")), 6).alias("mean"),
        )
        .select(F.col("grp").alias(group_col), "dim", "n_vecs", "mean")
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column: every
    iteration assigns the WHOLE corpus to its nearest centroid and
    recomputes centroids from the assignment (unlike ivf_* whose Lloyd
    runs on a bounded driver sample — this is the full-corpus refinement
    loop). Returns the final (id, cluster, dist2) assignment.

    Scale shape per iteration: the k x dims centroid model is bounded
    driver state compiled into ONE codegen'd assignment Project (squared
    distances as sequential zip_with/aggregate folds — deterministic
    summation order, no join, no Python), then the centroid update is
    the emb_centroids aggregate ((cluster, dim) key space = k x dims)
    collected back. Total: iters Projects + iters partial aggs.

    Engine-exactness: init is the k lowest-id vectors; distances round
    to 6 dp with the cluster id as the argmin tiebreak, and the UPDATED
    CENTROIDS ROUND TO 6 dp before feeding the next iteration — both
    engines then proceed from bit-identical model state every round, so
    partial-agg summation-order noise (~1e-12) can never compound across
    iterations or flip an assignment whose margin exceeds the rounding
    grid.
    """
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[0]] for r in init]

    def assign(cent_rows):
        structs = ", ".join(
            "struct(round(aggregate(zip_with({v}, array({lits}), "
            "(a, b) -> (double(a) - b) * (double(a) - b)), 0D, (s, x) -> s + x), 6) as d, "
            "{cid} as c)".format(
                v=vec_col, lits=", ".join(repr(x) for x in cvec), cid=cid
            )
            for cid, cvec in enumerate(cent_rows)
        )
        return df.selectExpr(
            f"{id_col} as id",
            f"{vec_col} as _v",
            f"array_min(array({structs})) as _best",
        ).select("id", "_v", F.col("_best.c").alias("cluster"), F.col("_best.d").alias("dist2"))

    a = assign(cents)
    for _ in range(iters - 1):
        upd = (
            a.select("cluster", F.posexplode("_v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in upd:
            by_c.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        # empty clusters keep their previous centroid (standard Lloyd)
        cents = [
            [by_c[c][d] for d in range(len(cents[c]))] if c in by_c else cents[c]
            for c in range(k)
        ]
        a = assign(cents)
    return a.select("id", "cluster", "dist2")
