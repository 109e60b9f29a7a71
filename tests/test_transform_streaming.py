"""Affine transform (P23), xlink resolution (L4), SRS upsert (L7),
and the Structured Streaming ingest path."""

import time

from pyspark.sql import functions as F

from citykg import streaming, transform
from citykg.extract import extract_triples
from citykg.fixtures import synth_docs
from conftest import SF_SMOKE


def test_affine_identity_roundtrip(spark):
    df = spark.createDataFrame([("1#2#3#4#5#6",)], "lit string")
    out = transform.affine_transform_literal(df, "lit", transform.IDENTITY_3X4).collect()[0]
    assert out.transformed == "1.0#2.0#3.0#4.0#5.0#6.0"


def test_affine_scale_translate(spark):
    df = spark.createDataFrame([("1#2#3",)], "lit string")
    m = [2.0, 0.0, 0.0, 10.0, 0.0, 2.0, 0.0, 20.0, 0.0, 0.0, 2.0, 30.0]
    out = transform.affine_transform_literal(df, "lit", m).collect()[0]
    assert out.transformed == "12.0#24.0#36.0"


def test_affine_plan_stays_jvm(spark):
    df = spark.createDataFrame([("1#2#3",)], "lit string")
    plan = transform.affine_transform_literal(df, "lit", transform.IDENTITY_3X4)
    assert "pythonUDF" not in plan._jdf.queryExecution().executedPlan().toString()


def test_resolve_xlinks_reports_dangling(spark):
    t = spark.createDataFrame(
        [
            ("iri://a/", "ocgml:id", "iri://a/", "iri", None, "g", "d", 0, 0),
            ("iri://a/", "ocgml:ref", "iri://missing/", "iri", None, "g", "d", 0, 1),
            ("iri://a/", "ocgml:name", "iri://missing/", "literal", None, "g", "d", 0, 2),
        ],
        "subj string, pred string, obj string, obj_type string, datatype string, "
        "graph string, doc_id string, span_idx int, pos int",
    )
    kept, dangling = transform.resolve_xlinks(t, drop_dangling=True)
    d = dangling.collect()
    assert len(d) == 1 and d[0].obj == "iri://missing/" and d[0].pred == "ocgml:ref"
    assert kept.count() == 2  # literal kept, dangling iri dropped


def test_srs_upsert_idempotent(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srs"))
    transform.upsert_srs(spark, out, 25833, "urn:ogc:def:crs:EPSG::25833", "http://b")
    transform.upsert_srs(spark, out, 25833, "urn:ogc:def:crs:EPSG::25833", "http://b")
    rows = spark.read.parquet(f"{out}/databasesrs").collect()
    assert len(rows) == 2
    assert {r.pred for r in rows} == {"ocgml:srid", "ocgml:srsname"}


def test_streaming_extract_matches_batch(spark, tmp_path_factory):
    """readStream over the landing dir produces exactly the batch triples
    (two drops into the landing dir -> two checkpointed micro-batch sets)."""
    land = str(tmp_path_factory.mktemp("landing"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    docs = synth_docs(spark, SF_SMOKE).persist()
    first = docs.where(F.expr("substring(doc_id, 5) < '00000250'"))
    second = docs.where(F.expr("substring(doc_id, 5) >= '00000250'"))
    first.write.mode("append").parquet(land)

    q = streaming.stream_extract_to_store(spark, land, out, ckpt)
    q.awaitTermination(120)

    n1 = spark.read.parquet(out).count()
    assert n1 == extract_triples(spark, first).count()

    # second drop: restart with the same checkpoint ingests ONLY new files
    second.write.mode("append").parquet(land)
    q2 = streaming.stream_extract_to_store(spark, land, out, ckpt)
    q2.awaitTermination(120)
    total = spark.read.parquet(out).count()
    assert total == extract_triples(spark, docs).count()
    docs.unpersist()


def test_stream_dedup_first_seen(spark, tmp_path_factory):
    """Stateful streaming UID-cache: duplicates across micro-batches are
    swallowed; state survives a checkpointed restart."""
    land = str(tmp_path_factory.mktemp("dd_landing"))
    out = str(tmp_path_factory.mktemp("dd_out"))
    ckpt = str(tmp_path_factory.mktemp("dd_ckpt"))

    spark.createDataFrame(
        [("B1", "a"), ("B2", "b"), ("B1", "dup-in-batch")], "gml_id string, payload string"
    ).write.mode("append").parquet(land)

    def run():
        s = (
            spark.readStream.schema("gml_id string, payload string")
            .parquet(land)
        )
        dd = streaming.stream_dedup_first_seen(s, "gml_id")
        q = (
            dd.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {r.gml_id for r in spark.read.parquet(out).collect()}
    assert got == {"B1", "B2"}

    # second drop: B1 again (cross-batch dup) + new B3
    spark.createDataFrame(
        [("B1", "late-dup"), ("B3", "c")], "gml_id string, payload string"
    ).write.mode("append").parquet(land)
    run()
    rows = spark.read.parquet(out).collect()
    assert {r.gml_id for r in rows} == {"B1", "B2", "B3"}
    assert len(rows) == 3  # B1 emitted exactly once, ever


def test_stream_windowed_counts(spark, tmp_path_factory):
    """Watermarked windowed agg over the events table: every emitted
    window matches the batch computation (append mode withholds only
    windows the watermark has not passed)."""
    land = str(tmp_path_factory.mktemp("wc_landing"))
    out = str(tmp_path_factory.mktemp("wc_out"))
    ckpt = str(tmp_path_factory.mktemp("wc_ckpt"))

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("ts", "event_type")
    ev.write.mode("append").parquet(land)

    s = spark.readStream.schema(ev.schema).parquet(land)
    wc = streaming.stream_windowed_counts(s, "ts", "event_type", "1 hour", "2 hours")
    q = (
        wc.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.win_start, r.event_type): r["count"] for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.win_start, r.event_type): r["count"]
        for r in streaming.stream_windowed_counts(ev, "ts", "event_type", "1 hour", "2 hours")
        .collect()
    }
    assert got and all(want[k] == v for k, v in got.items())


def test_streaming_pii_redaction_matches_batch(spark, tmp_path_factory):
    """The PII ops are stateless Projects, so the same frames compose
    with readStream unchanged — streaming output must equal batch."""
    from citykg.ops import text as t

    land = str(tmp_path_factory.mktemp("pii_landing"))
    out = str(tmp_path_factory.mktemp("pii_out"))
    ckpt = str(tmp_path_factory.mktemp("pii_ckpt"))

    df = spark.createDataFrame(
        [
            (1, "reach me at dev@example.org or 10.1.2.3"),
            (2, "dial +49-030-12345 now"),
            (3, "clean row"),
        ],
        "doc_id long, text string",
    )
    df.write.mode("append").parquet(land)

    s = spark.readStream.schema("doc_id long, text string").parquet(land)
    q = (
        t.redact_pii(t.with_pii_counts(s))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def key(frame):
        return {
            r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.redacted)
            for r in frame.collect()
        }

    assert key(spark.read.parquet(out)) == key(t.redact_pii(t.with_pii_counts(df)))


def test_stream_canonicalize_matches_batch_cc(spark, tmp_path_factory):
    """Streaming registry maintenance == batch connected components: docs
    arrive in two checkpointed drops; after each drain the registry equals
    the full batch CC over everything ingested so far (cross-batch entity
    merges included). The fold itself is canon.incremental_components —
    only touched components are re-solved per batch."""
    from citykg import canon, link
    from citykg.fixtures import synth_gazetteer

    land = str(tmp_path_factory.mktemp("cc_landing"))
    reg = str(tmp_path_factory.mktemp("cc_registry"))
    ckpt = str(tmp_path_factory.mktemp("cc_ckpt"))

    def groups_fn(batch_docs):
        linked = link.link_exact(link.entity_mentions(batch_docs), synth_gazetteer(spark))
        member = F.concat(
            F.lit("iri://addr/ADDR_"), F.expr("substring(doc_id, 5)"), F.lit("/")
        )
        return linked.where(F.col("entity_id").isNotNull()).select(
            "entity_id", member.alias("member")
        )

    docs = synth_docs(spark, SF_SMOKE).persist()
    first = docs.where(F.expr("substring(doc_id, 5) < '00000250'"))
    second = docs.where(F.expr("substring(doc_id, 5) >= '00000250'"))

    def batch_cc(d):
        edges = canon.same_as_edges(groups_fn(d), "entity_id", "member")
        return {
            (r.id, r.component)
            for r in canon.connected_components(edges).collect()
        }

    first.write.mode("append").parquet(land)
    q = streaming.stream_canonicalize(spark, land, reg, ckpt, groups_fn)
    q.awaitTermination(180)
    got1 = {(r.id, r.component) for r in streaming.read_registry(spark, reg).collect()}
    assert got1 == batch_cc(first)

    # second drop: checkpointed restart folds ONLY the new files into the
    # registry; result must equal a full recompute over all docs
    second.write.mode("append").parquet(land)
    q2 = streaming.stream_canonicalize(spark, land, reg, ckpt, groups_fn)
    q2.awaitTermination(180)
    got2 = {(r.id, r.component) for r in streaming.read_registry(spark, reg).collect()}
    assert got2 == batch_cc(docs)
    # commit protocol: a CURRENT pointer names the live snapshot; at most
    # the previous snapshot is retained (crash-safety window), older pruned
    import os
    versions = sorted(d for d in os.listdir(reg) if d.startswith("v"))
    with open(os.path.join(reg, "CURRENT")) as fh:
        assert fh.read().strip() == versions[-1]
    assert len(versions) <= 2
    docs.unpersist()


def test_stream_stream_join_range_bound(spark, tmp_path_factory):
    """Join matches only views in [click - 1h, click]: the in-window view
    joins, the 2h-old view and the LATER view do not."""
    from datetime import datetime

    from citykg.streaming import stream_stream_join

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return datetime(2024, 1, 1, 12 + mins // 60, mins % 60, 0)

    clicks = spark.createDataFrame(
        [(100, 1, t0)], "click_id long, l_user_id long, l_ts timestamp"
    )
    views = spark.createDataFrame(
        [
            (200, 1, ts(-30)),   # in window -> joins
            (201, 1, ts(-120)),  # too old
            (202, 1, ts(5)),     # after the click
            (203, 2, ts(-10)),   # other user
        ],
        "view_id long, r_user_id long, r_ts timestamp",
    )
    land_l = str(tmp_path_factory.mktemp("sjl"))
    land_r = str(tmp_path_factory.mktemp("sjr"))
    out = str(tmp_path_factory.mktemp("sjo"))
    ckpt = str(tmp_path_factory.mktemp("sjc"))
    clicks.write.mode("overwrite").parquet(land_l)
    views.write.mode("overwrite").parquet(land_r)
    sl = spark.readStream.schema(clicks.schema).parquet(land_l)
    sr = spark.readStream.schema(views.schema).parquet(land_r)
    j = stream_stream_join(sl, sr, "user_id")
    q = (
        j.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert [(r.click_id, r.view_id) for r in rows] == [(100, 200)]


def test_stream_sessionized_merges_and_closes(spark, tmp_path_factory):
    """session_window semantics: events under the gap merge into one
    session (end = last event + gap); only sessions the final watermark
    passed are emitted in append mode — the still-open tail session and
    any session ending inside the watermark horizon stay withheld."""
    from datetime import datetime, timedelta

    land = str(tmp_path_factory.mktemp("sess_landing"))
    out = str(tmp_path_factory.mktemp("sess_out"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: two events 10 min apart -> ONE session, closed long ago
        (1, t0), (1, t0 + timedelta(minutes=10)),
        # user 1: a second session 3 h later, still closed
        (1, t0 + timedelta(hours=3)),
        # user 2: a session ending within the 2 h watermark horizon -> withheld
        (2, t0 + timedelta(hours=23)),
        # watermark anchor: the max event time
        (3, t0 + timedelta(hours=24)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    ev.write.mode("append").parquet(land)

    s = spark.readStream.schema(ev.schema).parquet(land)
    w = streaming.stream_sessionized(s, "ts", "user_id", "30 minutes", "2 hours")
    q = (
        w.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.user_id, r.session_start, r.n_events)
           for r in spark.read.parquet(out).collect()}
    assert got == {
        (1, t0, 2),                        # merged pair
        (1, t0 + timedelta(hours=3), 1),   # second closed session
    }


def test_stream_sessionized_resumes_from_checkpoint(spark, tmp_path_factory):
    """Kill-and-resume: a session whose events arrive across a query
    RESTART still merges into one session — the session state lives in
    the checkpoint, not the process. Final output equals the single-run
    batch computation."""
    from datetime import datetime, timedelta

    land = str(tmp_path_factory.mktemp("sessr_landing"))
    out = str(tmp_path_factory.mktemp("sessr_out"))
    ckpt = str(tmp_path_factory.mktemp("sessr_ckpt"))
    t0 = datetime(2024, 3, 1)

    def run_available(tag):
        s = spark.readStream.schema("user_id long, ts timestamp").parquet(land)
        w = streaming.stream_sessionized(s, "ts", "user_id", "30 minutes", "1 hours")
        q = (
            w.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two events 10 min apart — session still OPEN (watermark
    # hasn't passed its end), so nothing is emitted yet
    b1 = [(1, t0), (1, t0 + timedelta(minutes=10))]
    spark.createDataFrame(b1, "user_id long, ts timestamp").write.mode("append").parquet(land)
    run_available("b1")
    assert spark.read.parquet(out).count() == 0

    # batch 2 (NEW query instance, same checkpoint): a third event still
    # inside the gap merges into the checkpointed session; a far-future
    # anchor advances the watermark past its end
    b2 = [(1, t0 + timedelta(minutes=20)), (2, t0 + timedelta(hours=24))]
    spark.createDataFrame(b2, "user_id long, ts timestamp").write.mode("append").parquet(land)
    run_available("b2")

    got = {(r.user_id, r.session_start, r.n_events)
           for r in spark.read.parquet(out).collect()}
    assert got == {(1, t0, 3)}  # ONE merged session spanning the restart


def _mini_triples(spark, rows):
    from citykg.schema import TRIPLE_SCHEMA

    return spark.createDataFrame(
        [
            (s, p, o, "literal", None, "building", d, 0, 0)
            for s, p, o, d in rows
        ],
        TRIPLE_SCHEMA,
    )


def test_upsert_epoch_replay_idempotent(spark, tmp_path_factory):
    """The foreachBatch body skips an epoch whose manifest stage is
    already committed — a replayed micro-batch (crash between sink work
    and offset-log commit) cannot double-apply."""
    out = str(tmp_path_factory.mktemp("up_out"))
    v1 = _mini_triples(
        spark,
        [("A", "ocgml:p", "x", "doc_1"), ("B", "ocgml:p", "y", "doc_2")],
    )
    assert streaming.upsert_epoch(v1, out, 0, n_buckets=4) is True
    from citykg import materialize

    before = sorted(
        (r.subj, r.obj) for r in materialize.read_triples(spark, out).collect()
    )
    # replay the SAME epoch: skipped, store byte-identical
    assert streaming.upsert_epoch(v1, out, 0, n_buckets=4) is False
    after = sorted(
        (r.subj, r.obj) for r in materialize.read_triples(spark, out).collect()
    )
    assert after == before == [("A", "x"), ("B", "y")]


def test_upsert_epoch_crash_window_converges(spark, tmp_path_factory):
    """A crash mid-upsert (append partially visible, manifest row never
    written) replays safely: the delete phase removes the partial rows of
    the batch's subjects before re-appending."""
    from citykg import materialize

    out = str(tmp_path_factory.mktemp("up_crash"))
    v1 = _mini_triples(spark, [("A", "ocgml:p", "x", "doc_1")])
    streaming.upsert_epoch(v1, out, 0, n_buckets=4)
    # simulate the crash window: epoch 1's append landed but its manifest
    # row did not — apply the raw append WITHOUT the ledger entry
    v2 = _mini_triples(spark, [("A", "ocgml:p", "x-v2", "doc_1")])
    from citykg.materialize import _adapter, with_bucket

    _adapter(spark, out).append(
        with_bucket(v2, 4).sortWithinPartitions("graph", "bucket", "subj")
    )
    # replay of epoch 1 is NOT skipped (no manifest row) and converges
    assert streaming.upsert_epoch(v2, out, 1, n_buckets=4) is True
    rows = sorted(
        (r.subj, r.obj) for r in materialize.read_triples(spark, out).collect()
    )
    assert rows == [("A", "x-v2")]


def test_stream_upsert_store_last_version_wins(spark, tmp_path_factory):
    """End-to-end: two mtime-ordered landing files stream through
    foreachBatch upserts; the store holds the newest version per subject
    and the restart with the same checkpoint applies only new files."""
    import os
    import time as _time

    from citykg import materialize

    land = str(tmp_path_factory.mktemp("up_land"))
    out = str(tmp_path_factory.mktemp("up_store"))
    ckpt = str(tmp_path_factory.mktemp("up_ckpt"))
    v1 = _mini_triples(
        spark,
        [("A", "ocgml:p", "a1", "doc_1"), ("B", "ocgml:p", "b1", "doc_2")],
    )
    v2 = _mini_triples(spark, [("A", "ocgml:p", "a2", "doc_1")])
    for i, frame in enumerate((v1, v2)):
        vdir = str(tmp_path_factory.mktemp(f"up_v{i}"))
        frame.coalesce(1).write.mode("overwrite").parquet(vdir)
        part = next(p for p in os.listdir(vdir) if p.endswith(".parquet"))
        dst = os.path.join(land, f"v{i}.parquet")
        os.rename(os.path.join(vdir, part), dst)
        ts = _time.time() - 200 + i * 100
        os.utime(dst, (ts, ts))

    def run():
        s = (
            spark.readStream.schema(v1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q = streaming.stream_upsert_store(spark, s, out, ckpt, n_buckets=4)
        q.awaitTermination(120)

    run()
    rows = sorted(
        (r.subj, r.obj) for r in materialize.read_triples(spark, out).collect()
    )
    assert rows == [("A", "a2"), ("B", "b1")]
    # third drop after the stream finished: only the new file is applied
    v3 = _mini_triples(spark, [("B", "ocgml:p", "b3", "doc_2")])
    vdir = str(tmp_path_factory.mktemp("up_v3"))
    v3.coalesce(1).write.mode("overwrite").parquet(vdir)
    part = next(p for p in os.listdir(vdir) if p.endswith(".parquet"))
    os.rename(os.path.join(vdir, part), os.path.join(land, "v3.parquet"))
    run()
    rows = sorted(
        (r.subj, r.obj) for r in materialize.read_triples(spark, out).collect()
    )
    assert rows == [("A", "a2"), ("B", "b3")]


def test_stream_hll_registers_match_batch(spark, tmp_path_factory):
    """The HLL register file is a MAX-merge aggregate, so the streamed
    (watermark-closed) registers must equal the batch computation
    register-for-register, and folding them through hll_estimate gives
    a sane estimate (within 4 sigma of exact on every emitted window)."""
    from citykg.ops import sketch

    land = str(tmp_path_factory.mktemp("hll_landing"))
    out = str(tmp_path_factory.mktemp("hll_out"))
    ckpt = str(tmp_path_factory.mktemp("hll_ckpt"))

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "ts", "user_id", "event_type"
    )
    ev.write.mode("append").parquet(land)

    s = spark.readStream.schema(ev.schema).parquet(land)
    regs = streaming.stream_hll_registers(s, "ts", "user_id", "event_type")
    q = (
        regs.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.win_start, r.event_type, r.bucket): r.m_rank
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.win_start, r.event_type, r.bucket): r.m_rank
        for r in streaming.stream_hll_registers(
            ev, "ts", "user_id", "event_type"
        ).collect()
    }
    assert got and all(want[k] == v for k, v in got.items())

    est = {
        (r.win_start, r.event_type): r.hll_estimate
        for r in sketch.hll_estimate(
            spark.read.parquet(out), ["win_start", "event_type"]
        ).collect()
    }
    exact = {
        (r.win_start, r.event_type): r.n
        for r in ev.withColumn("win_start", F.date_trunc("hour", "ts"))
        .groupBy("win_start", "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, e in est.items():
        assert abs(e - exact[k]) / exact[k] < 4 * 1.04 / 16 + 0.05
