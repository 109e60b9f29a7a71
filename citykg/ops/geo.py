"""Geometric analytics over '#'-separated geometry literals (SURVEY §2.5).

Reference semantics reproduced here:

* A2 area          — GeoSpatialProcessor.CalculateArea
  (/root/reference/agents/src/main/java/uk/ac/cam/cares/twa/cities/tasks/geo/
   GeoSpatialProcessor.java:162) — we compute the true 3D polygon area via
  the Newell normal (|n|/2), which equals the JTS planar area for flat rings.
* A3 validity      — GeoSpatialProcessor.IsValid/IsValidDetail
  (GeoSpatialProcessor.java:48-74) — ring-level checks (point count,
  closure, degeneracy) with a reason string, JTS IsValidDetail-style.
* A10 surface classification — MultiSurfaceThematicisationTask
  (agents/.../tasks/geo/MultiSurfaceThematicisationTask.java:31-34,52-54,
   113-147): classify ROOF/WALL/GROUND by the polygon normal's deviation
  from the vertical axis vs a critical-angle threshold.
* A1 footprint union — StatementTransformer.filterResult
  (impexp-core/.../blazegraph/StatementTransformer.java:478-491): union the
  per-entity ground polygons after a validity + minimum-area filter. Without
  a geometry library in this container the default path is the ENVELOPE
  union (bbox fold over members + summed member area); an exact
  shapely-backed path is gated behind an import-try.
* Q7 distance ops (DWithin/Beyond) — SpatialOperatorName.java:35-49. The
  reference's Blazegraph backend stubs these out (blazegraph/
  SQLAdapter.java:139-147); we implement them Spark-first as a grid-cell
  pair join (no cartesian product: each point lands in one cell, candidate
  pairs come from a 3x3 neighbor-cell equi-join, then the exact distance
  filter runs on candidates only). At 100 TB this is the standard
  bin-join pattern: shuffle is O(points x 9), never O(points^2).

All expressions are JVM-side (whole-stage codegen); no Python in the path.
Literals parse with split('#') -> transform(double) exactly per the decode
contract GeoSpatialProcessor.GeomDataType (GeoSpatialProcessor.java:26-43).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def _pt(axis: int, i: str) -> str:
    """SQL for coordinate `axis` (0=x,1=y,2=z) of 0-based point index expr
    `i` over the parsed array `c` (element_at is 1-based)."""
    return f"element_at(c, cast(({i}) * 3 + {axis + 1} as int))"


def _newell_struct() -> str:
    """aggregate(...) producing named_struct(nx, ny, nz) — Newell's method
    over the closed ring (sum i = 0..n-2; ring closure makes the wraparound
    term zero). Rings of fewer than 2 points short-circuit to the zero
    normal (guarding the sequence/element_at against descending ranges and
    ANSI INVALID_ARRAY_INDEX); validity then classifies them as
    too_few_points / zero_area instead of the job erroring."""
    zero = "named_struct('nx', 0.0D, 'ny', 0.0D, 'nz', 0.0D)"
    agg = (
        "aggregate(sequence(0, int(size(c) / 3) - 2), "
        f"{zero}, (acc, i) -> named_struct("
        f"'nx', acc.nx + ({_pt(1, 'i')} - {_pt(1, 'i + 1')}) * ({_pt(2, 'i')} + {_pt(2, 'i + 1')}), "
        f"'ny', acc.ny + ({_pt(2, 'i')} - {_pt(2, 'i + 1')}) * ({_pt(0, 'i')} + {_pt(0, 'i + 1')}), "
        f"'nz', acc.nz + ({_pt(0, 'i')} - {_pt(0, 'i + 1')}) * ({_pt(1, 'i')} + {_pt(1, 'i + 1')})))"
    )
    return f"CASE WHEN size(c) >= 6 THEN {agg} ELSE {zero} END"


def with_coords(df: DataFrame, lit_col: str, out: str = "c") -> DataFrame:
    # try_cast: a non-numeric token (an IRI obj row sliding through a
    # reordered filter, dirty web data) yields NULL coords for downstream
    # validity filters to drop — under ANSI mode a plain cast would kill
    # the whole job on the first bad row, and Catalyst may evaluate this
    # projection before a sibling filter conjunct
    return df.withColumn(out, F.expr(f"transform(split({lit_col}, '#'), v -> try_cast(v as double))"))


def with_normal(df: DataFrame, lit_col: str) -> DataFrame:
    """Adds nx, ny, nz (unnormalized Newell normal) for the FIRST ring of
    the literal (exterior ring; matches the thematicisation task, which
    classifies on the exterior)."""
    n = _newell_struct()
    return (
        with_coords(df, lit_col)
        .withColumn("_n", F.expr(n))
        .selectExpr("*", "_n.nx as nx", "_n.ny as ny", "_n.nz as nz")
        .drop("_n", "c")
    )


def with_area3d(df: DataFrame, lit_col: str, out: str = "area") -> DataFrame:
    """A2: planar polygon area = |Newell normal| / 2 (exact for planar
    rings in any orientation, reduces to the shoelace area for z=const)."""
    n = _newell_struct()
    return (
        with_coords(df, lit_col)
        .withColumn("_n", F.expr(n))
        .withColumn(
            out,
            F.expr("sqrt(_n.nx * _n.nx + _n.ny * _n.ny + _n.nz * _n.nz) / 2.0D"),
        )
        .drop("_n", "c")
    )


def classify_surface(
    df: DataFrame, lit_col: str, theta_deg: float = 45.0, out: str = "surf_class"
) -> DataFrame:
    """A10: ROOF if the normal is within theta of straight up, GROUND if
    within theta of straight down, else WALL (critical-angle dispatch per
    MultiSurfaceThematicisationTask.java:113-147)."""
    cos_t = math.cos(math.radians(theta_deg))
    d = with_normal(df, lit_col)
    mag = F.expr("sqrt(nx * nx + ny * ny + nz * nz)")
    cosv = (F.col("nz") / mag)
    return d.withColumn(
        out,
        F.when(mag == 0.0, F.lit("DEGENERATE"))
        .when(cosv >= cos_t, F.lit("ROOF"))
        .when(cosv <= -cos_t, F.lit("GROUND"))
        .otherwise(F.lit("WALL")),
    ).drop("nx", "ny", "nz")


def force_2d(df: DataFrame, lit_col: str, out: str = "lit2d") -> DataFrame:
    """A5 Force2D (GeoSpatialProcessor.Force2D:144): drop the z coordinate
    from a 3D '#'-literal — keep tokens at index % 3 != 2, re-join. Pure
    string/array expression (no double re-render)."""
    return df.withColumn(
        out,
        F.expr(
            f"array_join(transform(filter(transform(split({lit_col}, '#'), (v, i) -> "
            "named_struct('v', v, 'i', i)), s -> s.i % 3 <> 2), s -> s.v), '#')"
        ),
    )


def ring_validity(df: DataFrame, lit_col: str) -> DataFrame:
    """A3: IsValidDetail analog. Adds is_valid + reason
    ('ok' | 'too_few_points' | 'not_closed' | 'zero_area')."""
    n = _newell_struct()
    d = with_coords(df, lit_col).withColumn("_n", F.expr(n))
    npts = F.expr("int(size(c) / 3)")
    closed = F.expr(
        "element_at(c, 1) = element_at(c, cast(size(c) - 2 as int)) AND "
        "element_at(c, 2) = element_at(c, cast(size(c) - 1 as int)) AND "
        "element_at(c, 3) = element_at(c, cast(size(c) as int))"
    )
    area = F.expr("sqrt(_n.nx * _n.nx + _n.ny * _n.ny + _n.nz * _n.nz) / 2.0D")
    reason = (
        F.when(npts < 4, F.lit("too_few_points"))
        .when(~closed, F.lit("not_closed"))
        .when(area <= 0.0, F.lit("zero_area"))
        .otherwise(F.lit("ok"))
    )
    return (
        d.withColumn("reason", reason)
        .withColumn("is_valid", F.col("reason") == "ok")
        .drop("_n", "c")
    )


def footprint_union(
    df: DataFrame,
    group_col: str,
    lit_col: str,
    min_area: float = 0.0,
    exact: bool = False,
) -> DataFrame:
    """A1: per-group footprint after validity + min-area filtering
    (StatementTransformer.filterResult:478-491 applies exactly this filter
    before JTS UnaryUnion). Default path = envelope union: bbox fold over
    the members' coordinates plus summed member area — one partial-agg
    shuffle, no geometry lib. `exact=True` opts in to the shapely-backed
    unary_union path (requires shapely; explicit opt-in so the output
    schema/semantics never flip on an environment change).

    Returns (group, n_members, xmin, ymin, xmax, ymax, total_area[, wkt]).
    """
    valid = ring_validity(df, lit_col)
    valid = with_area3d(valid.where("is_valid"), lit_col).where(F.col("area") > min_area)
    if exact:
        return _footprint_union_shapely(valid, group_col, lit_col)
    c = with_coords(valid, lit_col)
    xs = "filter(transform(c, (v, i) -> named_struct('v', v, 'i', i)), s -> s.i % 3 = 0)"
    ys = "filter(transform(c, (v, i) -> named_struct('v', v, 'i', i)), s -> s.i % 3 = 1)"
    agg_min = lambda arr: f"aggregate({arr}, cast('Infinity' as double), (a, s) -> least(a, s.v))"  # noqa: E731
    agg_max = lambda arr: f"aggregate({arr}, cast('-Infinity' as double), (a, s) -> greatest(a, s.v))"  # noqa: E731
    c = c.selectExpr(
        group_col,
        "area",
        f"{agg_min(xs)} as _xmin",
        f"{agg_min(ys)} as _ymin",
        f"{agg_max(xs)} as _xmax",
        f"{agg_max(ys)} as _ymax",
    )
    return c.groupBy(group_col).agg(
        F.count("*").alias("n_members"),
        F.min("_xmin").alias("xmin"),
        F.min("_ymin").alias("ymin"),
        F.max("_xmax").alias("xmax"),
        F.max("_ymax").alias("ymax"),
        F.sum("area").alias("total_area"),
    )


def _footprint_union_shapely(valid: DataFrame, group_col: str, lit_col: str) -> DataFrame:
    """Exact unary_union per group via applyInPandas (runs only when
    shapely is installed; 2D projection of ring exteriors)."""
    import pandas as pd
    from shapely.geometry import Polygon
    from shapely.ops import unary_union

    def union_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        polys = []
        for lit in pdf[lit_col]:
            vs = [float(v) for v in lit.split("#")]
            pts = [(vs[i], vs[i + 1]) for i in range(0, len(vs), 3)]
            polys.append(Polygon(pts))
        u = unary_union(polys)
        xmin, ymin, xmax, ymax = u.bounds
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_members": [len(polys)],
                "xmin": [xmin],
                "ymin": [ymin],
                "xmax": [xmax],
                "ymax": [ymax],
                "total_area": [u.area],
                "wkt": [u.wkt],
            }
        )

    schema = (
        f"{group_col} string, n_members long, xmin double, ymin double, "
        "xmax double, ymax double, total_area double, wkt string"
    )
    return valid.select(group_col, lit_col).groupBy(group_col).applyInPandas(union_group, schema)


def dwithin_pairs(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    distance: float,
) -> DataFrame:
    """Q7 DWithin: all unordered point pairs with planar distance <
    `distance`.

    Scale path: assign each point to a `distance`-sized grid cell, explode
    each point into its 3x3 neighbor cells on ONE side of the join, then
    equi-join on the cell key. Every true pair shares a cell with the
    exploded side, candidate count stays ~uniform, and the join is a plain
    hash shuffle on (cx, cy) — no cartesian, skew bounded by local point
    density rather than key popularity.
    """
    cell = lambda c: F.floor(F.col(c) / F.lit(distance)).cast("long")  # noqa: E731
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).withColumn("_cx", cell("_x")).withColumn("_cy", cell("_y"))
    probe = (
        pts.withColumn("_dx", F.explode(F.array(*[F.lit(v) for v in (-1, 0, 1)])))
        .withColumn("_dy", F.explode(F.array(*[F.lit(v) for v in (-1, 0, 1)])))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_x").alias("xa"),
            F.col("_y").alias("ya"),
            (F.col("_cx") + F.col("_dx")).alias("_cx"),
            (F.col("_cy") + F.col("_dy")).alias("_cy"),
        )
    )
    build = pts.select(
        F.col("_id").alias("id_b"), F.col("_x").alias("xb"), F.col("_y").alias("yb"),
        "_cx", "_cy",
    )
    cand = probe.join(build, ["_cx", "_cy"]).where(F.col("id_a") < F.col("id_b"))
    dist = F.expr("sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb))")
    cand = cand.withColumn("dist", dist)
    # no distinct needed: the build side sits in exactly one cell, so each
    # (a, b) pair matches on at most one (cx, cy) key
    return cand.where(F.col("dist") < distance).select("id_a", "id_b", "dist")


def knn_within(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    distance: float,
    k: int = 3,
) -> DataFrame:
    """Radius-bounded k-nearest-neighbor join: for every point, its k
    nearest OTHER points within `distance` (planar), rank 1 = closest.
    The radius bound is what keeps the grid-cell join EXACT at scale —
    unbounded kNN cannot guarantee the true k-th neighbor shares a cell,
    bounded kNN can (cell size = radius, 3x3 probe covers the disc); it
    is also the variant spatial engines ship as `ST_DWithin + rank`
    since an unbounded global kNN is unanswerable without an index scan.

    Plan shape: same grid-cell equi-join as dwithin_pairs but DIRECTED
    (every point ranks its own candidates), then one id_a-partitioned
    window over candidates — partition size is bounded by local point
    density inside the disc, not corpus size. Ties at 6-decimal distance
    break by neighbor id, so ranks are deterministic.

    Output: (id_a, id_b, rank, dist)."""
    cell = lambda c: F.floor(F.col(c) / F.lit(distance)).cast("long")  # noqa: E731
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).withColumn("_cx", cell("_x")).withColumn("_cy", cell("_y"))
    probe = (
        pts.withColumn("_dx", F.explode(F.array(*[F.lit(v) for v in (-1, 0, 1)])))
        .withColumn("_dy", F.explode(F.array(*[F.lit(v) for v in (-1, 0, 1)])))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_x").alias("xa"),
            F.col("_y").alias("ya"),
            (F.col("_cx") + F.col("_dx")).alias("_cx"),
            (F.col("_cy") + F.col("_dy")).alias("_cy"),
        )
    )
    build = pts.select(
        F.col("_id").alias("id_b"), F.col("_x").alias("xb"), F.col("_y").alias("yb"),
        "_cx", "_cy",
    )
    cand = (
        probe.join(build, ["_cx", "_cy"])
        .where(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "dist",
            F.round(
                F.expr("sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb))"), 6
            ),
        )
        .where(F.col("dist") <= distance)
    )
    w = Window.partitionBy("id_a").orderBy(F.col("dist").asc(), F.col("id_b").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id_a", "id_b", "rank", "dist")
    )


def _ray_cast_inside() -> str:
    """SQL expr: even-odd ray cast of point (_px, _py) against the first
    ring of the parsed coord array `c` (UPRNTask.uprnIntersectsGeometry,
    agents/.../geo/UPRNTask.java:159-165, runs the same point-in-polygon
    test through JTS). Horizontal edges make the first conjunct false
    before the division (double /0 -> Inf compares false), so the
    expression is total."""
    xi, yi = _pt(0, "i"), _pt(1, "i")
    xj, yj = _pt(0, "i + 1"), _pt(1, "i + 1")
    cross = (
        "aggregate(sequence(0, int(size(c) / 3) - 2), 0, (acc, i) -> acc + "
        f"IF((({yi} > _py) != ({yj} > _py)) AND "
        f"(_px < ({xj} - {xi}) * (_py - {yi}) / ({yj} - {yi}) + {xi}), 1, 0))"
    )
    return f"CASE WHEN size(c) >= 12 THEN ({cross}) % 2 = 1 ELSE false END"


def point_in_polygon_join(
    points: DataFrame,
    polys: DataFrame,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "poly_id",
    lit_col: str = "lit",
    cell_size: float = 64.0,
) -> DataFrame:
    """UPRN-style spatial containment join: which address points sit inside
    which footprint polygons (UPRNTask: bbox prefilter, then exact
    point-in-polygon). Returns (point_id, poly_id).

    Scale shape: each polygon explodes into the grid cells covering its
    bbox (bounded by footprint size / cell_size), each point lands in ONE
    cell, candidates come from the (cx, cy) equi-join, and the exact
    ray cast runs on candidates only — the same bin-join pattern as
    dwithin_pairs, never O(points x polys)."""
    pg = with_coords(polys.select(poly_id, lit_col), lit_col)
    # drop degenerate/dirty polygons (fewer than 3 points or non-numeric
    # tokens) BEFORE the bbox math: an empty aggregate leaves the
    # +/-Infinity init value, and int(floor(Infinity)) is an ANSI
    # overflow; such rows can't contain a point anyway
    pg = pg.where("size(c) >= 9 AND NOT exists(c, v -> v IS NULL)")
    xs = "filter(transform(c, (v, i) -> named_struct('v', v, 'i', i)), s -> s.i % 3 = 0)"
    ys = "filter(transform(c, (v, i) -> named_struct('v', v, 'i', i)), s -> s.i % 3 = 1)"
    agg_min = lambda arr: f"aggregate({arr}, cast('Infinity' as double), (a, s) -> least(a, s.v))"  # noqa: E731
    agg_max = lambda arr: f"aggregate({arr}, cast('-Infinity' as double), (a, s) -> greatest(a, s.v))"  # noqa: E731
    cs = float(cell_size)
    # try_cast keeps the bbox math TOTAL: a degenerate/dirty polygon's
    # +/-Infinity fold init reaches floor() when the optimizer infers an
    # isnotnull(join-key) filter below the dirty-row guard and evaluates
    # this sequence via subexpression elimination on pre-guard rows —
    # under ANSI a plain int cast then kills the job; try_cast yields
    # NULL bounds -> NULL sequence -> the row explodes to nothing
    cell_of = lambda agg: f"try_cast(floor({agg} / {cs}D) as int)"  # noqa: E731
    pg = pg.selectExpr(
        poly_id,
        "c",
        f"sequence({cell_of(agg_min(xs))}, {cell_of(agg_max(xs))}) as _cxs",
        f"sequence({cell_of(agg_min(ys))}, {cell_of(agg_max(ys))}) as _cys",
    ).withColumn("_cx", F.explode("_cxs")).withColumn("_cy", F.explode("_cys")).drop(
        "_cxs", "_cys"
    )
    pt = points.select(
        F.col(point_id),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
    ).withColumn("_cx", F.expr(f"int(floor(_px / {cs}D))")).withColumn(
        "_cy", F.expr(f"int(floor(_py / {cs}D))")
    )
    # no dedup needed: the point side sits in exactly one cell, so each
    # (point, poly) candidate arises from at most one (cx, cy) key
    return (
        pt.join(pg, ["_cx", "_cy"])
        .where(F.expr(_ray_cast_inside()))
        .select(point_id, poly_id)
    )


def beyond_filter(
    df: DataFrame, x_col: str, y_col: str, px: float, py: float, distance: float
) -> DataFrame:
    """Q7 Beyond: keep rows farther than `distance` from a fixed query
    point — the export-filter form of the operator (a selection, pushed to
    the scan as a plain predicate; Beyond over all pairs would be the
    complement of dwithin_pairs and is intentionally not materialized)."""
    d2 = (F.col(x_col) - px) ** 2 + (F.col(y_col) - py) ** 2
    return df.where(d2 > distance * distance)


def envelope_relation_case(a: str, b: str) -> str:
    """SQL CASE classifying the spatial relation between two axis-aligned
    envelopes (structs with xmin/ymin/xmax/ymax prefixed `a`/`b`) —
    DE-9IM on boxes: equals / touches (boundaries meet, interiors don't)
    / within / contains (boundary contact allowed, per JTS) / overlaps /
    disjoint. Shared by the Spark operator and the DuckDB oracle (dialect-
    neutral SQL), so both engines classify identically by construction."""
    disjoint = (
        f"{a}xmax < {b}xmin OR {b}xmax < {a}xmin OR "
        f"{a}ymax < {b}ymin OR {b}ymax < {a}ymin"
    )
    equals = (
        f"{a}xmin = {b}xmin AND {a}ymin = {b}ymin AND "
        f"{a}xmax = {b}xmax AND {a}ymax = {b}ymax"
    )
    interiors = (
        f"least({a}xmax, {b}xmax) > greatest({a}xmin, {b}xmin) AND "
        f"least({a}ymax, {b}ymax) > greatest({a}ymin, {b}ymin)"
    )
    a_in_b = (
        f"{a}xmin >= {b}xmin AND {a}xmax <= {b}xmax AND "
        f"{a}ymin >= {b}ymin AND {a}ymax <= {b}ymax"
    )
    b_in_a = (
        f"{b}xmin >= {a}xmin AND {b}xmax <= {a}xmax AND "
        f"{b}ymin >= {a}ymin AND {b}ymax <= {a}ymax"
    )
    return (
        f"CASE WHEN {disjoint} THEN 'disjoint' "
        f"WHEN {equals} THEN 'equals' "
        f"WHEN NOT ({interiors}) THEN 'touches' "
        f"WHEN {a_in_b} THEN 'within' "
        f"WHEN {b_in_a} THEN 'contains' "
        f"ELSE 'overlaps' END"
    )


def envelope_relations(
    env: DataFrame,
    id_col: str = "id",
    cell_size: float = 64.0,
) -> DataFrame:
    """Q7 remaining predicates — Equals/Touches/Within/Contains/Overlaps
    (SpatialOperatorName.java:35-49; the reference's Blazegraph KG path
    returns null for these, blazegraph/SQLAdapter.java:139-147, while its
    SQL export path builds them in SpatialOperatorBuilder.java — this is
    the Spark equivalent of the latter over feature envelopes).

    Input: (id, xmin, ymin, xmax, ymax). Output: (id_a, id_b, relation)
    for every non-disjoint unordered pair. Candidates come from a
    grid-cell equi-join — each envelope explodes into the cells covering
    its bbox, pairs dedup before classification — so the join is a hash
    shuffle on cell keys, never O(n^2); any intersecting pair shares at
    least one covered cell, and pairs that never meet in a cell are
    disjoint, which the output drops anyway. Skew is bounded by local
    envelope density per cell, the same bound as dwithin_pairs."""
    cs = float(cell_size)
    # try_cast for the same reason as point_in_polygon_join: non-finite or
    # NULL envelopes must explode to zero cells, not ANSI-error the job
    boxed = env.selectExpr(
        f"{id_col} AS _id",
        "cast(xmin as double) AS xmin", "cast(ymin as double) AS ymin",
        "cast(xmax as double) AS xmax", "cast(ymax as double) AS ymax",
        f"explode(sequence(try_cast(floor(xmin / {cs}D) as int), try_cast(floor(xmax / {cs}D) as int))) AS _cx",
    ).selectExpr(
        "*",
        f"explode(sequence(try_cast(floor(ymin / {cs}D) as int), try_cast(floor(ymax / {cs}D) as int))) AS _cy",
    )
    a = boxed.toDF("id_a", "axmin", "aymin", "axmax", "aymax", "_cx", "_cy")
    b = boxed.toDF("id_b", "bxmin", "bymin", "bxmax", "bymax", "_cx", "_cy")
    return (
        a.join(b, ["_cx", "_cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("relation", F.expr(envelope_relation_case("a", "b")))
        .where(F.col("relation") != "disjoint")
        .select("id_a", "id_b", "relation")
    )


def _rx(arr: str, i: str) -> str:
    """x of ring point `i` in a stride-3 coord array (1-indexed element_at)."""
    return f"element_at({arr}, cast(3 * ({i}) + 1 as int))"


def _ry(arr: str, i: str) -> str:
    return f"element_at({arr}, cast(3 * ({i}) + 2 as int))"


def _orient(px, py, qx, qy, rx, ry) -> str:
    """sign of the cross product (q-p) x (r-p): +1 left turn, -1 right, 0
    collinear."""
    return (
        f"sign((({qx}) - ({px})) * (({ry}) - ({py})) - "
        f"(({qy}) - ({py})) * (({rx}) - ({px})))"
    )


def _on_seg(px, py, qx, qy, rx, ry) -> str:
    """Given r collinear with segment p-q: is r within its bbox?"""
    return (
        f"least({px}, {qx}) <= ({rx}) AND ({rx}) <= greatest({px}, {qx}) AND "
        f"least({py}, {qy}) <= ({ry}) AND ({ry}) <= greatest({py}, {qy})"
    )


def _seg_pair(ca: str, cb: str, pred_of) -> str:
    """exists over all (segment of ca) x (segment of cb) with `pred_of`
    built from the 8 endpoint exprs — one nested higher-order exists,
    evaluated JVM-side per candidate pair."""
    ax, ay = _rx(ca, "i"), _ry(ca, "i")
    ax1, ay1 = _rx(ca, "i + 1"), _ry(ca, "i + 1")
    bx, by = _rx(cb, "j"), _ry(cb, "j")
    bx1, by1 = _rx(cb, "j + 1"), _ry(cb, "j + 1")
    pred = pred_of(ax, ay, ax1, ay1, bx, by, bx1, by1)
    return (
        f"exists(sequence(0, int(size({ca}) / 3) - 2), i -> "
        f"exists(sequence(0, int(size({cb}) / 3) - 2), j -> ({pred})))"
    )


def _proper_cross(ca: str, cb: str) -> str:
    """Any pair of boundary segments crossing at an interior point of both
    (strict straddle both ways) — the unambiguous 'interiors overlap'
    witness."""

    def pred(ax, ay, ax1, ay1, bx, by, bx1, by1):
        s1 = _orient(ax, ay, ax1, ay1, bx, by)
        s2 = _orient(ax, ay, ax1, ay1, bx1, by1)
        s3 = _orient(bx, by, bx1, by1, ax, ay)
        s4 = _orient(bx, by, bx1, by1, ax1, ay1)
        return f"({s1}) * ({s2}) < 0 AND ({s3}) * ({s4}) < 0"

    return _seg_pair(ca, cb, pred)


def _boundaries_meet(ca: str, cb: str) -> str:
    """Any segment intersection at all (proper, endpoint-touch, or
    collinear overlap) — the standard orientation test with the four
    collinear endpoint cases."""

    def pred(ax, ay, ax1, ay1, bx, by, bx1, by1):
        s1 = _orient(ax, ay, ax1, ay1, bx, by)
        s2 = _orient(ax, ay, ax1, ay1, bx1, by1)
        s3 = _orient(bx, by, bx1, by1, ax, ay)
        s4 = _orient(bx, by, bx1, by1, ax1, ay1)
        return (
            f"(({s1}) != ({s2}) AND ({s3}) != ({s4})) "
            f"OR (({s1}) = 0 AND {_on_seg(ax, ay, ax1, ay1, bx, by)}) "
            f"OR (({s2}) = 0 AND {_on_seg(ax, ay, ax1, ay1, bx1, by1)}) "
            f"OR (({s3}) = 0 AND {_on_seg(bx, by, bx1, by1, ax, ay)}) "
            f"OR (({s4}) = 0 AND {_on_seg(bx, by, bx1, by1, ax1, ay1)})"
        )

    return _seg_pair(ca, cb, pred)


def _pt_on_boundary(px: str, py: str, arr: str) -> str:
    qx, qy = _rx(arr, "i"), _ry(arr, "i")
    qx1, qy1 = _rx(arr, "i + 1"), _ry(arr, "i + 1")
    return (
        f"exists(sequence(0, int(size({arr}) / 3) - 2), i -> "
        f"({_orient(qx, qy, qx1, qy1, px, py)}) = 0 AND "
        f"{_on_seg(qx, qy, qx1, qy1, px, py)})"
    )


def _pt_raycast(px: str, py: str, arr: str) -> str:
    """Even-odd crossing count of point (px, py) vs ring `arr` (same form
    as _ray_cast_inside; only reliable off the boundary — combine with
    _pt_on_boundary)."""
    xi, yi = _rx(arr, "i"), _ry(arr, "i")
    xj, yj = _rx(arr, "i + 1"), _ry(arr, "i + 1")
    return (
        f"(aggregate(sequence(0, int(size({arr}) / 3) - 2), 0, (acc, i) -> acc + "
        f"IF(((({yi}) > ({py})) != (({yj}) > ({py}))) AND "
        f"(({px}) < (({xj}) - ({xi})) * (({py}) - ({yi})) / (({yj}) - ({yi})) + ({xi})), "
        f"1, 0)) % 2 = 1)"
    )


def _verts(ca: str, cb: str, quantifier: str, closed: bool) -> str:
    """forall/exists over ca's ring vertices: inside cb (closed = boundary
    counts as in; strict = boundary excluded)."""
    px, py = _rx(ca, "k"), _ry(ca, "k")
    on_b = _pt_on_boundary(px, py, cb)
    ray = _pt_raycast(px, py, cb)
    inside = f"(({on_b}) OR ({ray}))" if closed else f"((NOT ({on_b})) AND ({ray}))"
    return f"{quantifier}(sequence(0, int(size({ca}) / 3) - 2), k -> {inside})"


def _rings_equal(ca: str, cb: str) -> str:
    """Same vertex point-set (closing duplicate dropped, order/start-point
    free) — the single-ring 'equals' witness."""

    def norm(arr):
        return (
            f"array_sort(array_distinct(transform(sequence(0, int(size({arr}) / 3) - 2), "
            f"k -> struct({_rx(arr, 'k')} AS x, {_ry(arr, 'k')} AS y))))"
        )

    return f"{norm(ca)} = {norm(cb)}"


def ring_relation_case(ca: str = "ca", cb: str = "cb") -> str:
    """SQL CASE classifying the DE-9IM-style relation between two polygon
    OUTER RINGS (stride-3 coord arrays `ca`, `cb`, closed, XY projection) —
    the ring-exact upgrade of envelope_relation_case, matching what the
    reference's SQL export side builds geometry-level
    (SpatialOperatorBuilder.java, 287 LoC; SpatialOperatorName.java:35-49 —
    its Blazegraph KG path stubs ALL of these,
    blazegraph/SQLAdapter.java:139-147).

    Decision order: equal vertex sets -> 'equals'; a proper boundary
    crossing, or vertices of each strictly inside the other -> 'overlaps';
    all-vertices-in-closed containment -> 'within'/'contains' (boundary
    contact allowed, JTS semantics); one-sided strict containment with the
    rest outside -> 'overlaps'; boundaries meeting without any interior
    exchange -> 'touches'; else 'disjoint'.

    Scope (documented): single outer ring per geometry, no holes; ring
    assumed simple (non-self-intersecting), as produced by the importer's
    ring validation. Exactness additionally assumes GENERAL POSITION in
    two residual degenerate configurations: (1) if the boundaries cross
    ONLY through each other's vertices (a proper cross requires a strict
    straddle, s*s < 0) and neither ring has a vertex strictly inside the
    other, the interior overlap goes unwitnessed and the pair classifies
    'touches' instead of 'overlaps'; (2) `_rings_equal` compares vertex
    POINT-SETS, so two distinct simple polygons tracing the same vertex
    set in different edge orders would classify 'equals'. Neither
    configuration arises from the importer's snapped rectilinear rings;
    for adversarial inputs add a midpoint-of-shared-segment interior
    probe before trusting 'touches'/'equals'. Everything is Catalyst
    higher-order-function algebra over the candidate pair —
    O(|segA| x |segB|) per pair, JVM-side, no Python."""
    eq = _rings_equal(ca, cb)
    cross = _proper_cross(ca, cb)
    meet = _boundaries_meet(ca, cb)
    a_all_in = _verts(ca, cb, "forall", closed=True)
    b_all_in = _verts(cb, ca, "forall", closed=True)
    a_any_strict = _verts(ca, cb, "exists", closed=False)
    b_any_strict = _verts(cb, ca, "exists", closed=False)
    return (
        f"CASE WHEN {eq} THEN 'equals' "
        f"WHEN {cross} THEN 'overlaps' "
        f"WHEN ({a_any_strict}) AND ({b_any_strict}) THEN 'overlaps' "
        f"WHEN {a_all_in} THEN 'within' "
        f"WHEN {b_all_in} THEN 'contains' "
        f"WHEN ({a_any_strict}) OR ({b_any_strict}) THEN 'overlaps' "
        f"WHEN {meet} THEN 'touches' "
        f"ELSE 'disjoint' END"
    )


def ring_relations(
    pairs: DataFrame, lit_a: str, lit_b: str, out: str = "relation"
) -> DataFrame:
    """Classify pre-paired geometry literals ring-exactly. At scale the
    pair candidates come from the same grid-cell equi-join as
    envelope_relations (envelope test as the cheap prefilter — anything it
    calls 'disjoint' IS ring-disjoint, so only non-disjoint candidates pay
    the O(segA x segB) exact test); this operator is the per-pair
    classification stage."""
    return (
        with_coords(pairs, lit_a, out="ca")
        .transform(lambda d: with_coords(d, lit_b, out="cb"))
        .withColumn(out, F.expr(ring_relation_case("ca", "cb")))
        .drop("ca", "cb")
    )


# A8 write-back: the triple pattern DistanceAgent inserts per measured pair
# into the `distance` named graph (DistanceAgent.getSetDistanceQuery,
# agents/.../DistanceAgent.java:293-316) — an OM-2 Measure individual. The
# reference mints UUID subjects; here ids are content-derived (P24 policy:
# resume-stable, dedupable). (pred, obj_kind) per row; obj_kind 'a'/'b'
# substitutes the pair endpoints, 'val' the rendered distance, 'vuri' the
# value individual.
DISTANCE_WRITEBACK_ROWS = [
    ("dist", "rdf:type", "lit:om:Total3DStartEndDistance"),
    ("dist", "rdf:type", "lit:owl:NamedIndividual"),
    ("dist", "om:hasPhenomenon", "a"),
    ("dist", "om:hasPhenomenon", "b"),
    ("dist", "om:hasDimension", "lit:om:lengthDimension"),
    ("dist", "om:hasValue", "vuri"),
    ("vuri", "rdf:type", "lit:owl:NamedIndividual"),
    ("vuri", "rdf:type", "lit:om:Measure"),
    ("vuri", "om:hasNumericValue", "val"),
    ("vuri", "om:hasUnit", "lit:om:metre"),
]


def distance_writeback_triples(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    dist_col: str,
    base: str,
    key_col: str,
) -> DataFrame:
    """Render measured distances as the DistanceAgent insert pattern: 10
    triples per pair in the `distance` graph. Pure Project + explode of a
    10-element literal array — zero shuffles beyond whatever produced the
    pairs; the numeric value is %.6f-rendered so the string is identical
    across engines."""
    duri = F.concat(F.lit(f"{base}/distance/DIST_"), F.col(key_col), F.lit("/"))
    vuri = F.concat(F.lit(f"{base}/distance/VAL_"), F.col(key_col), F.lit("/"))
    val = F.format_string("%.6f", F.col(dist_col))
    cols = []
    for subj_kind, pred, obj_kind in DISTANCE_WRITEBACK_ROWS:
        subj = duri if subj_kind == "dist" else vuri
        if obj_kind == "a":
            obj, kind = F.col(id_a), F.lit("iri")
        elif obj_kind == "b":
            obj, kind = F.col(id_b), F.lit("iri")
        elif obj_kind == "vuri":
            obj, kind = vuri, F.lit("iri")
        elif obj_kind == "val":
            obj, kind = val, F.lit("literal")
        else:
            obj, kind = F.lit(obj_kind[4:]), F.lit("literal")
        cols.append(F.struct(subj.alias("subj"), F.lit(pred).alias("pred"),
                             obj.alias("obj"), kind.alias("obj_type")))
    return pairs.select(F.explode(F.array(*cols)).alias("t")).select(
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        F.col("t.obj_type").alias("obj_type"),
        F.lit("distance").alias("graph"),
    )


def morton_interleave_sql(gx: str, gy: str, bits: int = 11) -> str:
    """Dialect-portable integer SQL for the Morton (Z-order) code of two
    grid coordinates: bit i of gx lands at position 2i, bit i of gy at
    2i+1. Fully parenthesized so shift/and precedence is identical in
    Spark SQL and DuckDB; pure bigint arithmetic, so the driver's oracle
    recomputes it bit-exactly.

    Why it exists: sorting/range-partitioning the store by this code
    places spatially-adjacent features in the same files (the Iceberg
    z-ordering layout), so a bbox query prunes to the handful of file
    ranges whose Morton intervals intersect the query box instead of
    scanning every partition — the read-side complement of the
    bucket(subj) write layout."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({gx}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({gy}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def solid_volume(
    df: DataFrame,
    group_col: str = "doc_id",
    lit_col: str = "lit",
    out: str = "volume",
) -> DataFrame:
    """Solid volume from a closed, outward-oriented boundary surface —
    the 3D companion of with_area3d for CityGML `gml:Solid` shells
    (lod1/lod2 building solids; the reference stores the shell polygons
    in SURFACE_GEOMETRY and derives metric quantities from them, e.g.
    GFA in CityInformationAgent). Divergence theorem over the
    fan-triangulated faces:

      V = (1/6) * | sum_faces sum_i det(v0, v_i, v_{i+1}) |

    which is exact for any closed shell with consistently outward faces
    (each face a planar ring, first point repeated last). Per-face fold
    is one aggregate() HOF over the parsed coordinate array — pure
    whole-stage-codegen Project — followed by ONE map-side-combinable
    sum per solid. No Python, no window, no driver round-trip; at 100 TB
    the only shuffle is the per-solid partial agg, keyed by the same
    feature id the extract stage already partitions on."""
    agg = (
        "aggregate(sequence(1, int(size(c) / 3) - 3), 0.0D, "
        "(acc, i) -> acc + ("
        f"{_pt(0, '0')} * ({_pt(1, 'i')} * {_pt(2, 'i + 1')} - {_pt(2, 'i')} * {_pt(1, 'i + 1')}) "
        f"- {_pt(1, '0')} * ({_pt(0, 'i')} * {_pt(2, 'i + 1')} - {_pt(2, 'i')} * {_pt(0, 'i + 1')}) "
        f"+ {_pt(2, '0')} * ({_pt(0, 'i')} * {_pt(1, 'i + 1')} - {_pt(1, 'i')} * {_pt(0, 'i + 1')})"
        "))"
    )
    # faces below a triangle (size < 12 = 4 stored points incl. closure)
    # contribute nothing — and the CASE keeps sequence() ascending
    # (sequence(1, 0) DESCENDS in Spark, and ANSI would then fault the
    # element_at), the same guard pattern as _newell_struct
    face_det = f"CASE WHEN size(c) >= 12 THEN {agg} ELSE 0.0D END"
    faces = with_coords(df, lit_col).withColumn("_det", F.expr(face_det))
    return faces.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("n_faces"),
        (F.abs(F.sum("_det")) / 6.0).alias(out),
    )


def convex_hull_stats(
    df: DataFrame,
    group_col: str = "doc_id",
    lit_col: str = "lit",
) -> DataFrame:
    """2D convex hull of a '#'-separated x#y point literal: hull vertex
    count + hull area (the footprint-simplification / site-envelope
    primitive; JTS ConvexHull is what GeoSpatialProcessor would reach
    for). Everything is array HOFs inside one codegen'd Project — no
    Python, no shuffle at all:

    * hull membership: vertex p is on the hull iff some other vertex m
      exists with every remaining vertex strictly to the left of ray
      p->m (cross > 0). O(n^3) per ring, which at CityGML ring sizes
      (bounded tens of vertices) is a few thousand fused comparisons
      per row — cheaper than a shuffle at any corpus scale, and
      embarrassingly parallel per row. Requires general position (no 3
      collinear vertices with 2 of them hull-adjacent), which snapped
      importer rings satisfy; degenerate inputs (< 3 points) yield
      n_hull = size and area 0.
    * ordering for the shoelace: hull vertices sort by atan2 around the
      hull centroid (convexity makes the angular order the polygon
      order); area = |sum cross| / 2.
    """
    # filter-after-transform keeps the sequence ascending and typed even
    # for degenerate literals (< 1 point) under ANSI
    pts = (
        "transform(filter(sequence(0, greatest(int(size(c) / 2) - 1, 0)), "
        "i -> i * 2 + 2 <= size(c)), "
        "i -> named_struct('x', element_at(c, cast(i * 2 + 1 as int)), "
        "'y', element_at(c, cast(i * 2 + 2 as int))))"
    )
    cross = (
        "((m.x - p.x) * (u.y - p.y) - (m.y - p.y) * (u.x - p.x))"
    )
    hull = (
        "filter(pts, p -> exists(pts, m -> (m.x <> p.x OR m.y <> p.y) AND "
        f"forall(pts, u -> ((u.x = p.x AND u.y = p.y) OR (u.x = m.x AND u.y = m.y) OR {cross} > 0.0D))))"
    )
    d = (
        df.withColumn("c", F.expr(f"transform(split({lit_col}, '#'), t -> cast(t as double))"))
        .withColumn("pts", F.expr(pts))
        .withColumn("hull", F.expr(hull))
        .withColumn(
            "hull",
            F.expr(
                "CASE WHEN size(pts) < 3 THEN pts ELSE hull END"
            ),
        )
    )
    # centroid of hull vertices -> angular sort -> shoelace
    d = (
        d.withColumn(
            "cx", F.expr("aggregate(hull, 0.0D, (a, h) -> a + h.x) / size(hull)")
        )
        .withColumn(
            "cy", F.expr("aggregate(hull, 0.0D, (a, h) -> a + h.y) / size(hull)")
        )
        .withColumn(
            "ordered",
            F.expr(
                "array_sort(transform(hull, h -> named_struct("
                "'ang', atan2(h.y - cy, h.x - cx), 'x', h.x, 'y', h.y)))"
            ),
        )
        .withColumn(
            "area2",
            F.expr(
                "CASE WHEN size(ordered) >= 3 THEN "
                "aggregate(sequence(0, size(ordered) - 1), 0.0D, (a, i) -> a + ("
                "element_at(ordered, cast(i + 1 as int)).x * element_at(ordered, cast((i + 1) % size(ordered) + 1 as int)).y"
                " - element_at(ordered, cast((i + 1) % size(ordered) + 1 as int)).x * element_at(ordered, cast(i + 1 as int)).y))"
                " ELSE 0.0D END"
            ),
        )
    )
    return d.select(
        group_col,
        F.size("hull").cast("int").alias("n_hull"),
        F.when(F.size("hull") < 3, F.lit(0.0))
        .otherwise(F.abs(F.col("area2")) / 2.0)
        .alias("hull_area"),
    )


def geodesic_ring_area(ring_col: str, radius_m: float = 6371008.8):
    """Spherical polygon area (m^2) of a CLOSED lon/lat ring — the
    projection-free companion to with_area3d's planar Newell measure
    (the reference re-projects to a metric CRS before measuring,
    DistanceAgent.computeDistance:271-284; on a global corpus no single
    metric CRS fits, so the spherical line integral is the scale path).

    Chamberlain & Duquette (JPL 2007): A = R^2/2 * |sum over edges of
    (lam2 - lam1) * (sin phi1 + sin phi2)|, angles in radians. `ring_col`
    is array<struct<lon:double,lat:double>> with first == last point.
    One sequential JVM fold per ring (HOF aggregate) — zero Python, zero
    shuffle; works inside any codegen'd Project.
    """
    fold = (
        f"aggregate(sequence(0, size({ring_col}) - 2), 0.0D, (a, i) -> a + "
        f"(radians(element_at({ring_col}, cast(i + 2 as int)).lon)"
        f" - radians(element_at({ring_col}, cast(i + 1 as int)).lon))"
        f" * (sin(radians(element_at({ring_col}, cast(i + 1 as int)).lat))"
        f" + sin(radians(element_at({ring_col}, cast(i + 2 as int)).lat))))"
    )
    return F.abs(F.expr(fold)) * (radius_m * radius_m / 2.0)
