"""Streaming tests: batch-equivalence of the streaming rollup (the
driver can't collect a stream, so correctness is pinned by comparing
the drained availableNow result against the batch q24 aggregation)."""

from pyspark.sql import functions as F

from spear_spark.sources import load_table
from spear_spark.streaming import (
    hourly_rollup_stream,
    run_available_now,
    sessionize_stream,
    stream_events,
)


def test_hourly_rollup_matches_batch(spark, sf_dir):
    stream = hourly_rollup_stream(stream_events(spark, sf_dir))
    run_available_now(stream, "rollup_test")
    got = {
        (r.hour_ts, r.event_type): (r.n, r.value_sum)
        for r in spark.table("rollup_test").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    expected = {
        (r.hour_ts, r.event_type): (r.n, r.value_sum)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        )
        .collect()
    }
    assert got == expected


def test_sessionize_runs_and_bounds(spark, sf_dir):
    stream = sessionize_stream(stream_events(spark, sf_dir), gap="10 minutes")
    run_available_now(stream, "sessions_test")
    rows = spark.table("sessions_test").collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_sessionize_stream_matches_batch_session_window(spark, sf_dir):
    """Batch (q83, built-in session_window) and streaming
    (sessionize_stream, same operator behind a watermark) must emit
    IDENTICAL session sets when the stream is fully drained — the
    equivalence that certifies the two surfaces share one
    sessionization semantics."""
    from spear_spark.relational import QUERIES

    stream = sessionize_stream(stream_events(spark, sf_dir), gap="30 minutes")
    run_available_now(stream, "sessions_eq_test")
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.table("sessions_eq_test").collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in QUERIES["q83_session_window"][0](spark, sf_dir).collect()
    }
    assert got == batch and len(batch) > 0


def test_q83_sessions_agree_with_q40_island_rewrite(spark, sf_dir):
    """q40 (lag→flag→running-sum) and q83 (built-in session_window)
    use the same strict-> gap rule, so per-user session counts and
    sizes must agree exactly."""
    from spear_spark.relational import QUERIES

    q40 = sorted(
        (r.user_id, r.n_events)
        for r in QUERIES["q40_sessionize"][0](spark, sf_dir).collect()
    )
    q83 = sorted(
        (r.user_id, r.n_events)
        for r in QUERIES["q83_session_window"][0](spark, sf_dir).collect()
    )
    assert q40 == q83


def test_running_user_stats_matches_batch(spark, sf_dir):
    """applyInPandasWithState custom stateful operator: after draining
    the bounded stream, the last update per user must equal the batch
    groupBy (count / exact cents sum / max)."""
    from spear_spark.streaming import running_user_stats

    stream = running_user_stats(stream_events(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_stats_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per batch to the sink; the
    # LAST row per user is the final state
    got = {}
    for r in spark.table("user_stats_test").collect():
        got[r.user_id] = (r.n_events, r.value_sum, r.max_value)

    ev = load_table(spark, sf_dir, "events")
    expected = {
        r.user_id: (r.n, r.s, r.m)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert got == expected


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    from spear_spark.streaming import dedup_stream

    stream = dedup_stream(stream_events(spark, sf_dir), ["user_id", "event_type"])
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_test").count()
    expected = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert got == expected


def test_stream_stream_join_matches_batch(spark, sf_dir):
    from spear_spark.sources import load_table
    from spear_spark.streaming import error_click_pairs_stream, stream_events

    stream = error_click_pairs_stream(stream_events(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("ss_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r) for r in spark.table("ss_join_test").collect()
    )

    ev = load_table(spark, sf_dir, "events")
    # same join in batch (no watermarks needed)
    from pyspark.sql import functions as F
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("e_user"), F.col("ts").alias("error_ts")
    )
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr("INTERVAL 10 minutes"))
    )
    want = sorted(
        tuple(r)
        for r in errors.join(clicks, cond, "inner")
        .select("event_id", F.col("e_user").alias("user_id"), "error_ts", "click_ts")
        .collect()
    )
    assert got == want and len(got) > 0


def test_foreach_batch_sink_idempotent(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from spear_spark.sources import load_table
    from spear_spark.streaming import stream_events, write_batches_idempotent

    out = str(tmp_path / "events_sink")
    # append-only stream (projection+filter): every batch's rows land in
    # that batch's partition exactly once.  (An aggregation in append
    # mode would withhold unexpired windows — sink aggregations with
    # update/complete mode or a transactional table instead.)
    stream = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "value")
    )
    q = write_batches_idempotent(stream, out, "sink_test")
    q.awaitTermination()

    written = spark.read.parquet(out)
    ev = load_table(spark, sf_dir, "events")
    want = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    got = sorted(tuple(r) for r in written.select("event_id", "user_id", "ts", "value").collect())
    assert got == sorted(tuple(r) for r in want.collect()) and len(got) > 0

    # replaying ONE batch overwrites only its own partition — no
    # duplicates, regardless of how many micro-batches the availableNow
    # run produced (replaying all rows as batch 0 would only test the
    # single-batch case and duplicate rows otherwise).
    replay_id = written.agg(F.min("_batch_id")).collect()[0][0]
    one_batch = written.filter(F.col("_batch_id") == replay_id)
    (
        one_batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(out)
    )
    again = sorted(tuple(r) for r in spark.read.parquet(out).select("event_id", "user_id", "ts", "value").collect())
    assert again == got


def test_count_min_stream_matches_batch_sketch(spark, sf_dir):
    """Draining the bounded stream yields cell-for-cell the batch
    Count-Min sketch of the same rows — so continuous profiling and
    offline profiling are interchangeable (bounded d*w state, no
    watermark needed)."""
    from spear_spark.streaming import count_min_stream, stream_events
    from spear_spark.operators.sketch import _cm_bucket

    stream = count_min_stream(stream_events(spark, sf_dir), "user_id")
    q = (
        stream.writeStream.format("memory")
        .queryName("cm_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.row, r.bucket): r.cnt for r in spark.table("cm_stream_test").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    k = F.col("user_id").cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cm_bucket(k, r, 1024).alias("bucket"))
            for r in range(4)
        ]
    )
    expected = {
        (r.row, r.bucket): r.cnt
        for r in ev.select(F.explode(cells).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_hll_register_stream_matches_batch(spark, sf_dir):
    """Drained streaming HLL registers equal the batch register table —
    continuous and offline distinct profiling are interchangeable."""
    from spear_spark.operators.sketch import hll_register_table
    from spear_spark.streaming import hll_register_stream, stream_events

    stream = hll_register_stream(stream_events(spark, sf_dir), "user_id")
    q = (
        stream.writeStream.format("memory")
        .queryName("hll_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.reg, r.max_rho) for r in spark.table("hll_stream_test").collect()}
    ev = load_table(spark, sf_dir, "events")
    expected = {
        (r.reg, r.max_rho)
        for r in hll_register_table(ev, F.col("user_id").cast("string")).collect()
    }
    assert got == expected


def test_cdc_state_stream_matches_batch_multibatch(spark, sf_dir, tmp_path):
    """Streaming changelog compaction across MULTIPLE micro-batches
    (maxFilesPerTrigger=1 over a two-file split) must converge to the
    batch cdc_latest_state of the full changelog — including deletes in
    a later batch cancelling keys upserted in an earlier one."""
    from pyspark.sql import functions as F

    from spear_spark.operators.cdc import cdc_latest_state
    from spear_spark.sources import load_table
    from spear_spark.streaming import cdc_state_stream, read_cdc_state

    ev = load_table(spark, sf_dir, "events").withColumn(
        "is_delete", F.col("event_type") == "error"
    )
    src = str(tmp_path / "changes")
    # two files split by time: the second batch carries later changes
    med = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    ev.filter(F.col("event_id") <= med).coalesce(1).write.parquet(src + "/f1")
    ev.filter(F.col("event_id") > med).coalesce(1).write.parquet(src + "/f2")

    schema = spark.read.parquet(src + "/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/f*")
    )
    state_path = str(tmp_path / "state")
    q = cdc_state_stream(
        stream, state_path,
        key_cols=["user_id"], order_cols=["ts", "event_id"],
        payload_cols=["event_type", "value"], delete_col="is_delete",
        query_name="cdc_test",
    )
    q.awaitTermination()

    got = read_cdc_state(spark, state_path).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    want = cdc_latest_state(
        ev, ["user_id"], ["ts", "event_id"], ["event_type", "value"],
        delete_expr=F.col("is_delete"),
    ).select("user_id", "ts", "event_id", "event_type", "value")
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and len(g) > 0


def test_sliding_rollup_matches_batch(spark, sf_dir):
    """Streaming sliding-window rollup == the batch groupBy over the
    same overlapping window expression (each event lands in
    size/slide = 4 windows)."""
    from pyspark.sql import functions as F

    from spear_spark.sources import load_table
    from spear_spark.streaming import run_available_now, sliding_rollup_stream, stream_events

    out = sliding_rollup_stream(stream_events(spark, sf_dir))
    run_available_now(out, "sliding_test")
    got = sorted(
        tuple(r)
        for r in spark.table("sliding_test").collect()
    )

    ev = load_table(spark, sf_dir, "events")
    want = sorted(
        tuple(r)
        for r in ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type", "n", "value_sum",
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_cdc_state_stream_out_of_order_and_restart(spark, tmp_path):
    """Reviewed failure modes, pinned: (1) a late-arriving upsert OLDER
    than an applied delete must NOT resurrect the key (tombstones
    persist in state); (2) restarts must CONTINUE the batch-id sequence
    via the durable checkpoint instead of restarting at 0 and wiping
    prior state."""
    from spear_spark.streaming import cdc_state_stream, read_cdc_state

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    schema = "k long, ts long, cid long, v double, is_delete boolean"

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = cdc_state_stream(
            stream, state,
            key_cols=["k"], order_cols=["ts", "cid"], payload_cols=["v"],
            delete_col="is_delete", query_name="cdc_ooo",
        )
        q.awaitTermination()

    run_batch([(1, 100, 1, 10.0, False), (2, 100, 2, 5.0, False)])  # run 1
    run_batch([(1, 200, 3, 0.0, True)])                             # run 2: delete k=1
    run_batch([(1, 150, 4, 9.0, False)])                            # run 3: LATE upsert

    got = sorted(
        tuple(r)
        for r in read_cdc_state(spark, state).select("k", "ts", "cid", "v").collect()
    )
    # k=1 stays deleted (late ts=150 < tombstone ts=200); k=2 survives
    # every restart — neither wiped by batch-id reuse nor resurrected
    assert got == [(2, 100, 2, 5.0)]


def test_enrich_stream_matches_batch_join(spark, sf_dir):
    """Stream-static enrichment: joining the event stream against a
    static per-user dimension must equal the batch join — including
    events whose user has NO dim row (left semantics keep them with
    nulls)."""
    from spear_spark.streaming import enrich_stream, run_available_now, stream_events

    ev = load_table(spark, sf_dir, "events")
    # static dim derived from half the users so the null path is real
    dim = (
        ev.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("tier", F.when(F.col("user_id") % 4 == 0, "gold").otherwise("basic"))
    )
    enriched = enrich_stream(
        stream_events(spark, sf_dir).select("event_id", "user_id"), dim, "user_id"
    )
    run_available_now(enriched, "enrich_test", output_mode="append")
    got = {
        r.event_id: (r.user_id, r.tier) for r in spark.table("enrich_test").collect()
    }
    expected = {
        r.event_id: (r.user_id, r.tier)
        for r in ev.select("event_id", "user_id").join(dim, "user_id", "left").collect()
    }
    assert got == expected
    assert any(t is None for _, t in got.values())  # null path exercised

    import pytest as _pytest
    with _pytest.raises(ValueError, match="left.*inner|'left' or 'inner'"):
        enrich_stream(stream_events(spark, sf_dir), dim, "user_id", how="full")


def test_bloom_words_stream_matches_batch_and_probes(spark, sf_dir):
    """Drained streaming Bloom words equal the batch bloom_build word
    table (minus the sentinel), and — with the sentinel appended — the
    drained filter probes through the SAME bloom_probe with zero false
    negatives over every streamed key."""
    from pyspark.sql import functions as F

    from spear_spark.operators.dedup import (
        _bloom_sentinel,
        bloom_build,
        bloom_probe,
    )
    from spear_spark.streaming import bloom_words_stream, stream_events

    n_bits, k, seed = 1 << 14, 4, 42
    stream = bloom_words_stream(
        stream_events(spark, sf_dir).select(F.col("user_id").cast("string").alias("key")),
        "key", n_bits, k, seed,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("bloom_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.word_idx, r.bits) for r in spark.table("bloom_stream_test").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key")
    )
    batch = bloom_build(ev, "key", n_bits, k, seed)
    expected = {
        (r.word_idx, r.bits) for r in batch.collect() if r.word_idx != -1
    }
    assert got == expected and len(got) > 0
    # drained words + sentinel probe exactly like a batch-built filter
    sentinel = spark.createDataFrame(
        [(-1, _bloom_sentinel(n_bits, k, seed))], "word_idx long, bits long"
    )
    drained = spark.table("bloom_stream_test").unionByName(sentinel)
    flags = bloom_probe(ev.distinct(), "key", drained, n_bits, k, seed)
    assert flags.filter(~F.col("maybe_member")).count() == 0  # no false negatives


def test_daily_cm_cells_stream_feeds_cm_rolling(spark, sf_dir):
    """Drained per-day streaming cells equal the batch per-day grid
    cell-for-cell, and feeding them to cm_rolling reproduces the batch
    rolling sketch — the full continuous-profile lifecycle: stream
    maintains daily tables, batch answers sliding-window queries."""
    from spear_spark.operators.sketch import _cm_bucket, cm_rolling
    from spear_spark.streaming import daily_cm_cells_stream, stream_events

    stream = daily_cm_cells_stream(stream_events(spark, sf_dir), "user_id")
    q = (
        stream.writeStream.format("memory")
        .queryName("daily_cm_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("daily_cm_test")
    ev = load_table(spark, sf_dir, "events")
    k = F.col("user_id").cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cm_bucket(k, r, 1024).alias("bucket"))
            for r in range(4)
        ]
    )
    batch_daily = (
        ev.select(
            F.expr("unix_micros(ts) div 86400000000").alias("period"),
            F.explode(cells).alias("_c"),
        )
        .groupBy("period", F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, drained.collect())) == sorted(
        map(tuple, batch_daily.collect())
    )
    rolled_from_stream = sorted(map(tuple, cm_rolling(drained, 7).collect()))
    rolled_batch = sorted(map(tuple, cm_rolling(batch_daily, 7).collect()))
    assert rolled_from_stream == rolled_batch


def test_daily_hll_registers_stream_matches_batch(spark, sf_dir):
    """Drained per-day streaming registers equal the batch per-day
    register table — and survive a double-drain union unchanged
    (MAX-idempotent), the replay-safety CM's SUM path lacks."""
    from spear_spark.operators.sketch import hll_register_table_by, hll_rolling
    from spear_spark.streaming import daily_hll_registers_stream, stream_events

    stream = daily_hll_registers_stream(stream_events(spark, sf_dir), "user_id")
    q = (
        stream.writeStream.format("memory")
        .queryName("daily_hll_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("daily_hll_test")
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").alias("period"),
        F.col("user_id").cast("string").alias("u"),
    )
    batch_daily = hll_register_table_by(ev, "period", F.col("u"))
    assert sorted(map(tuple, drained.collect())) == sorted(
        map(tuple, batch_daily.collect())
    )
    replayed = sorted(map(tuple,
                          hll_rolling(drained.unionByName(drained), 7).collect()))
    once = sorted(map(tuple, hll_rolling(batch_daily, 7).collect()))
    assert replayed == once


def test_novel_grams_stream_matches_batch_profile(spark, sf_dir, tmp_path):
    """Drained streaming novelty, summed over hash buckets per doc,
    equals ngram_novelty_profile EXACTLY when batches arrive in doc-id
    order (the backfill drain shape): file 1 = docs below the median
    id, file 2 = the rest, maxFilesPerTrigger=1 — grams first seen in
    batch 1 must not count as novel again in batch 2, and the
    within-batch min-doc rule must match the batch operator's."""
    import os
    import time

    from spear_spark.operators.dedup import ngram_novelty_profile
    from spear_spark.streaming import novel_grams_stream

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .filter(F.col("doc_id") < 60)
    )
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
    docs.filter(F.col("doc_id") < 30).toPandas().to_parquet(f1)
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    docs.filter(F.col("doc_id") >= 30).toPandas().to_parquet(f2)
    os.utime(f2)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = novel_grams_stream(stream, "text", "doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("novel_grams_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = (
        spark.table("novel_grams_test")
        .groupBy("doc_id")
        .agg(F.sum("n_pos").alias("n_ngrams"), F.sum("n_novel").alias("n_novel"))
    )
    got = {r.doc_id: (r.n_ngrams, r.n_novel) for r in drained.collect()}
    want = {r.doc_id: (r.n_ngrams, r.n_novel)
            for r in ngram_novelty_profile(docs, "text", "doc_id").collect()}
    assert got == want


def test_daily_token_counts_stream_drift_monitor(spark, sf_dir, tmp_path):
    """Full ingest-drift lifecycle: drained per-day streaming token
    counts equal the batch explode+count of each day's documents
    row-for-row, and feeding them to jsd_vs_reference reproduces the
    pairwise group_js_divergence of (that day's docs, reference docs)
    — drift is computed from tiny persisted daily tables, never by
    re-scanning raw text."""
    from spear_spark.operators.relevance import (
        group_js_divergence,
        jsd_vs_reference,
    )
    from spear_spark.operators.text import tokens
    from spear_spark.streaming import daily_token_counts_stream

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 90)
        .select(
            "doc_id",
            "text",
            F.to_timestamp(
                F.concat(
                    F.lit("2024-01-0"),
                    (F.col("doc_id") % 3 + 1).cast("string"),
                    F.lit(" 12:00:00"),
                )
            ).alias("ts"),
        )
    )
    src = str(tmp_path / "docs_ts_stream")
    docs.write.parquet(src)
    stream = daily_token_counts_stream(
        spark.readStream.schema(docs.schema).parquet(src), "text"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("daily_tok_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("daily_tok_test")
    batch_daily = (
        docs.select(
            F.expr("unix_micros(ts) div 86400000000").alias("period"),
            F.explode(tokens("text")).alias("tok"),
        )
        .groupBy("period", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert sorted(map(tuple, drained.collect())) == sorted(
        map(tuple, batch_daily.collect())
    )
    # drift readout from the drained tables == pairwise JSD on raw text
    ref_docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 90) & (F.col("doc_id") < 150)
    )
    ref_counts = (
        ref_docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {r.period: r.jsd for r in
           jsd_vs_reference(drained, ["period"], ref_counts).collect()}
    day_of = F.expr("unix_micros(ts) div 86400000000").cast("string")
    tagged = docs.select(day_of.alias("g"), "text").unionByName(
        ref_docs.select(F.lit("zref").alias("g"), "text")
    )
    want = {int(r.group_a): r.jsd
            for r in group_js_divergence(tagged, "g", "text").collect()
            if r.group_b == "zref"}
    assert len(got) == 3 and got == want


def test_daily_event_counts_stream_volume_monitor(spark, sf_dir, tmp_path):
    """Volume-anomaly monitor lifecycle: drained per-day streaming
    event counts equal the batch (period, event_type) groupBy count
    row-for-row, and feeding them to mad_outliers reproduces
    p99_volume_anomalies exactly — the anomaly page is computed from
    tiny persisted daily rows, never by re-scanning raw events."""
    from spear_spark.operators.stats import mad_outliers
    from spear_spark.streaming import daily_event_counts_stream, stream_events

    stream = daily_event_counts_stream(stream_events(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("daily_ev_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("daily_ev_test")
    ev = load_table(spark, sf_dir, "events")
    batch_daily = ev.select(
        F.expr("unix_micros(ts) div 86400000000").alias("period"),
        "event_type",
    ).groupBy("period", "event_type").agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, drained.collect())) == sorted(
        map(tuple, batch_daily.collect())
    )
    # persist the tiny daily rows (the production pattern) — also the
    # memory-sink-view fix: mad_outliers self-joins its input, which a
    # MemoryPlan view's shared exprIds cannot survive
    persisted = str(tmp_path / "daily_ev_counts")
    drained.write.parquet(persisted)
    got = sorted(map(tuple, mad_outliers(
        spark.read.parquet(persisted), "n", ["event_type"], "period",
        threshold=2.0,
    ).select("event_type", "period", "n", "mscore").collect()))
    import __spark_entry__ as entry_mod
    want = sorted(map(tuple, entry_mod.queries()["p99_volume_anomalies"](
        spark, sf_dir).collect()))
    assert got == want and got  # non-degenerate: the fixture has anomalies


def test_semdedup_stream_matches_batch_drops(spark, sf_dir, tmp_path):
    """Drained streaming SemDeDup equals the batch operator's drop set
    row-for-row when batches arrive in id order (the backfill drain
    shape, same contract as the novelty tracker): centroids are fit
    ONCE with the batch Lloyd engine, frozen, and fed to both sides —
    file 1 = vectors below the median id, file 2 = the rest,
    maxFilesPerTrigger=1, so a cross-batch near-pair must be caught by
    the state (earlier-id vectors persist as partner candidates even
    after being dropped, the batch pair rule)."""
    import os
    import time

    from spear_spark.operators.dedup import semdedup
    from spear_spark.streaming import semdedup_stream

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )

    # batch side fits Lloyd itself; capture the frozen centroids
    info: dict = {}
    want = {
        (r.drop_id, r.keep_id)
        for r in semdedup(
            emb, "embedding", "vec_id", k=8, threshold=0.35, tol=0.3,
            max_iters=10, info=info,
        ).collect()
    }
    assert want, "batch semdedup found no drops — threshold too high for the law"

    mid = emb.approxQuantile("vec_id", [0.5], 0.0)[0]
    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
    emb.filter(F.col("vec_id") < mid).toPandas().to_parquet(f1)
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    emb.filter(F.col("vec_id") >= mid).toPandas().to_parquet(f2)
    os.utime(f2)

    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = semdedup_stream(
        stream, "embedding", "vec_id", info["centroids"], threshold=0.35
    )
    q = (
        out.writeStream.format("memory")
        .queryName("semdedup_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.drop_id, r.keep_id)
        for r in spark.table("semdedup_stream_test").collect()
    }
    assert got == want


def test_semdedup_stream_rejects_string_ids(spark, sf_dir):
    import pytest

    from spear_spark.streaming import semdedup_stream

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    )
    with pytest.raises(TypeError, match="integral id"):
        semdedup_stream(emb, "embedding", "vec_id", [[0.0] * 64], 0.9)


def test_semdedup_stream_out_of_order_recovers_drop_set(spark, sf_dir, tmp_path):
    """The unordered-drain contract: batches arriving in REVERSED id
    order (high-id file first) still recover batch semdedup's exact
    drop SET — when a smaller-id partner arrives after its larger-id
    near-duplicate is already in state, the stream emits the late
    ``(drop_id=larger, keep_id=smaller)`` instead of silently losing
    the drop (the round-10 ADVICE hole).  keep_id under disorder is
    the revealing partner, not necessarily the batch minimum, so the
    law here is set-of-drop-ids equality plus keep<drop sanity — the
    id-ordered twin above keeps the row-for-row law."""
    import os
    import time

    from spear_spark.operators.dedup import semdedup
    from spear_spark.streaming import semdedup_stream

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    info: dict = {}
    want = {
        (r.drop_id, r.keep_id)
        for r in semdedup(
            emb, "embedding", "vec_id", k=8, threshold=0.35, tol=0.3,
            max_iters=10, info=info,
        ).collect()
    }
    assert want, "batch semdedup found no drops — threshold too high for the law"

    mid = emb.approxQuantile("vec_id", [0.5], 0.0)[0]
    src = str(tmp_path / "emb_stream_rev")
    os.makedirs(src)
    f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
    # REVERSED: the high-id half lands first
    emb.filter(F.col("vec_id") >= mid).toPandas().to_parquet(f1)
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    emb.filter(F.col("vec_id") < mid).toPandas().to_parquet(f2)
    os.utime(f2)

    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = semdedup_stream(
        stream, "embedding", "vec_id", info["centroids"], threshold=0.35
    )
    q = (
        out.writeStream.format("memory")
        .queryName("semdedup_stream_rev_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.drop_id, r.keep_id)
        for r in spark.table("semdedup_stream_rev_test").collect()
    }
    assert {d for d, _ in got} == {d for d, _ in want}
    assert all(k < d for d, k in got)
    assert len(got) == len({d for d, _ in got})  # one row per dropped doc
    # the reversal genuinely exercised the late-drop path: at least one
    # drop pairs a low-id keep (second file) with a high-id drop (first)
    assert any(k < mid <= d for d, k in got)


def test_semdedup_stream_zero_norm_raises(spark, tmp_path):
    """A zero-norm vector fails LOUDLY with a ValueError naming the id
    (cosine undefined), not an obscure decimal.InvalidOperation deep in
    the Pandas state worker (round-10 ADVICE)."""
    import os

    import pytest

    from spear_spark.streaming import semdedup_stream

    src = str(tmp_path / "zero_norm_stream")
    os.makedirs(src)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    df.toPandas().to_parquet(os.path.join(src, "a.parquet"))
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = semdedup_stream(stream, "embedding", "vec_id", [[0.0, 0.0]], 0.9)
    q = (
        out.writeStream.format("memory")
        .queryName("semdedup_zero_norm_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="zero-norm vector id=2"):
        q.awaitTermination()


def test_chunk_dedup_stream_matches_batch_report(spark, sf_dir, tmp_path):
    """Drained streaming chunk-dedup (summed over buckets per doc)
    equals dedup.chunk_dedup_report row-for-row when batches arrive in
    id order (the backfill drain shape): file 1 = docs below the
    median id, file 2 = the rest, maxFilesPerTrigger=1, so a
    cross-batch duplicated chunk must be caught by the hash→min-owner
    state."""
    import os
    import time

    from spear_spark.operators.dedup import chunk_dedup_report
    from spear_spark.streaming import chunk_dedup_stream

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    want = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.n_tokens, r.dup_tokens)
        for r in chunk_dedup_report(docs, "text", "doc_id", modulus=16).collect()
    }
    assert any(v[1] > 0 for v in want.values()), "fixture has no chunk dups"

    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
    docs.filter(F.col("doc_id") < mid).toPandas().to_parquet(f1)
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    docs.filter(F.col("doc_id") >= mid).toPandas().to_parquet(f2)
    os.utime(f2)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = chunk_dedup_stream(stream, "text", "doc_id", modulus=16, buckets=8)
    q = (
        out.writeStream.format("memory")
        .queryName("chunk_dedup_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got: dict = {}
    for r in spark.table("chunk_dedup_stream_test").collect():
        c = got.setdefault(r.doc_id, [0, 0, 0, 0])
        c[0] += r.n_chunks
        c[1] += r.n_dup_chunks
        c[2] += r.n_tokens
        c[3] += r.dup_tokens
    assert {k: tuple(v) for k, v in got.items()} == want


def test_chunk_dedup_stream_rejects_string_ids(spark, sf_dir):
    import pytest

    from spear_spark.streaming import chunk_dedup_stream

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    with pytest.raises(TypeError, match="integral id"):
        chunk_dedup_stream(docs, "text", "doc_id")


def test_novel_grams_stream_rejects_string_ids(spark, sf_dir):
    import pytest

    from spear_spark.streaming import novel_grams_stream

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    with pytest.raises(TypeError, match="integral id"):
        novel_grams_stream(docs, "text", "doc_id")


def test_daily_value_bins_stream_psi_monitor(spark, sf_dir, tmp_path):
    """Full numeric-drift lifecycle: drained per-day streaming value
    bins equal the batch bin-count of each day's documents
    row-for-row, and feeding them to psi_from_bins against a
    reference-day histogram reproduces psi_vs_reference of (that
    day's docs, reference docs) exactly — drift computed from tiny
    persisted daily tables, never by re-scanning raw values."""
    from spear_spark.operators.stats import (
        psi_from_bins,
        psi_vs_reference,
        value_bin,
    )
    from spear_spark.streaming import daily_value_bins_stream

    lo, hi, nb = 0.0, 600.0, 24
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 90)
        .select(
            "doc_id",
            "n_chars",
            F.to_timestamp(
                F.concat(
                    F.lit("2024-01-0"),
                    (F.col("doc_id") % 3 + 1).cast("string"),
                    F.lit(" 12:00:00"),
                )
            ).alias("ts"),
        )
    )
    src = str(tmp_path / "docs_bins_stream")
    docs.write.parquet(src)
    stream = daily_value_bins_stream(
        spark.readStream.schema(docs.schema).parquet(src), "n_chars", lo, hi, nb
    )
    run_available_now(stream, "daily_bins_test")
    drained = spark.table("daily_bins_test")

    # (a) drained day == batch bin-count row-for-row
    batch = (
        docs.filter(F.col("n_chars").isNotNull())
        .select(
            F.date_diff(F.to_date("ts"), F.lit("1970-01-01")).alias("period"),
            value_bin(F.col("n_chars"), lo, hi, nb).alias("bin"),
        )
        .groupBy("period", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {(r.period, r.bin): r.c for r in drained.collect()}
    want = {(r.period, r.bin): r.c for r in batch.collect()}
    assert got == want

    # (b) PSI from the persisted daily tables == raw-data PSI exactly:
    # score day 1 against day 3 (the reference day)
    periods = sorted({p for p, _ in got})
    day, ref_day = periods[0], periods[-1]
    day_bins = drained.filter(F.col("period") == day)
    ref_bins = drained.filter(F.col("period") == ref_day).select("bin", "c")
    from_tables = {
        r.period: r.psi
        for r in psi_from_bins(day_bins, ["period"], ref_bins, nb).collect()
    }
    raw = psi_vs_reference(
        docs.filter(F.col("doc_id") % 3 == 0),  # day 1 docs (2024-01-01)
        docs.filter(F.col("doc_id") % 3 == 2),  # day 3 docs (2024-01-03)
        "n_chars",
        [],
        lo,
        hi,
        nb,
    )
    # empty group_cols: global PSI — one row
    [raw_row] = raw.collect()
    assert from_tables[day] == raw_row.psi


def test_stateless_projection_ops_are_stream_safe(spark, sf_dir, tmp_path):
    """The Exchange-free projection operators (gopher_rules,
    canary_scan) must apply to a streaming DataFrame unchanged — the
    contract that makes the quality gate and canary audit runnable on
    the ingest firehose with zero state.  A drained stream equals the
    batch output row-for-row."""
    from spear_spark.operators.dedup import canary_scan
    from spear_spark.operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_stateless_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    g_out = gopher_rules(stream, "text", "doc_id", min_words=20,
                         min_stopword_hits=1)
    q = (
        g_out.writeStream.format("memory").queryName("gopher_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("gopher_stream_test").collect()}
    want = {
        tuple(r)
        for r in gopher_rules(
            docs, "text", "doc_id", min_words=20, min_stopword_hits=1
        ).collect()
    }
    assert got == want

    c_out = canary_scan(stream, "text", "doc_id", ["key agg", "zz-never"])
    q = (
        c_out.writeStream.format("memory").queryName("canary_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("canary_stream_test").collect()}
    want = {
        tuple(r)
        for r in canary_scan(docs, "text", "doc_id", ["key agg", "zz-never"]).collect()
    }
    assert got == want


def test_centroid_cells_stream_matches_batch_and_feeds_drift(
    spark, sf_dir, tmp_path
):
    """Drained per-day streaming centroid cells equal the batch per-day
    cell table cell-for-cell, and the integer merge over periods fed to
    centroid_drift_from_cells reproduces the batch centroid_drift
    BITWISE — the full continuous-drift lifecycle."""
    from spear_spark.operators.similarity import (
        centroid_cells,
        centroid_drift,
        centroid_drift_from_cells,
        quantized_vec,
    )
    from spear_spark.streaming import centroid_cells_stream

    emb = load_table(spark, sf_dir, "embeddings")
    # deterministic event times spread over 3 days
    vecs = emb.select(
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + (F.col("vec_id") % 72) * F.lit(3_600_000_000)
        ).alias("ts"),
        F.col("label"),
        F.col("embedding").alias("v"),
    )
    src = str(tmp_path / "vecs")
    vecs.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream_src = spark.readStream.schema(schema).format("parquet").load(src)
    stream = centroid_cells_stream(stream_src, "v", "label", "ts", dim=64)
    q = (
        stream.writeStream.format("memory")
        .queryName("centroid_cells_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("centroid_cells_test")
    batch_daily = (
        vecs.select(
            F.expr("unix_micros(ts) div 86400000000").alias("period"),
            F.col("label"),
            F.posexplode(quantized_vec("v", 64)).alias("d", "_q"),
        )
        .groupBy("period", "label", "d")
        .agg(
            F.sum("_q").alias("s"),
            F.sum((F.col("_q") * F.col("_q")).cast("decimal(38,0)")).alias("sq"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    assert drained.select("period").distinct().count() >= 3
    assert sorted(map(tuple, drained.collect())) == sorted(
        map(tuple, batch_daily.collect())
    )
    merged = drained.groupBy("label", "d").agg(
        F.sum("s").alias("s"), F.sum("sq").alias("sq"), F.sum("n").alias("n")
    )
    from_stream = sorted(
        map(tuple, centroid_drift_from_cells(merged).collect())
    )
    batch = sorted(map(tuple, centroid_drift(emb, "embedding", "label", 64).collect()))
    assert from_stream == batch
    # ONE state, both readouts: the same merged cells finish to the
    # batch dispersion bitwise as well
    from spear_spark.operators.similarity import (
        centroid_dispersion,
        centroid_dispersion_from_cells,
    )

    disp_stream = sorted(
        map(tuple, centroid_dispersion_from_cells(merged).collect())
    )
    disp_batch = sorted(
        map(tuple, centroid_dispersion(emb, "embedding", "label", 64).collect())
    )
    assert disp_stream == disp_batch
    # and the batch cell table itself merges identically
    assert sorted(
        map(tuple, centroid_cells(emb, "embedding", "label", 64).collect())
    ) == sorted(map(tuple, merged.collect()))


def test_budget_gate_stream_matches_batch_prefix(spark, sf_dir, tmp_path):
    """Drained over an id-ordered two-file backfill, the streaming
    budget gate's accepted set equals token_budget_select with a
    CONSTANT quality (tie-break = id order), per source — including a
    group whose blocker doc straddles the file boundary (state must
    carry spent+blocked across batches); rejected docs emit audit rows."""
    import os
    import time

    from spear_spark.operators.sampling import token_budget_select
    from spear_spark.operators.text import tokens
    from spear_spark.streaming import budget_gate_stream

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.size(tokens("text")).cast("long").alias("tokens"),
            F.col("source"),
        )
    )
    budget = 800
    batch = token_budget_select(
        docs.withColumn("q", F.lit(0.0)),
        "doc_id", "tokens", "q", budget, group_col="source",
    )
    want = {(r.source, r.doc_id) for r in batch.collect()}
    assert want and len(want) < docs.count()  # nontrivial cut

    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src = str(tmp_path / "gate_stream")
    os.makedirs(src)
    f1, f2 = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
    docs.filter(F.col("doc_id") < mid).toPandas().to_parquet(f1)
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    docs.filter(F.col("doc_id") >= mid).toPandas().to_parquet(f2)
    os.utime(f2)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = budget_gate_stream(stream, "doc_id", "tokens", "source", budget)
    q = (
        out.writeStream.format("memory")
        .queryName("budget_gate_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("budget_gate_test").collect()
    assert len(drained) == docs.count()  # every doc gets a verdict row
    got = {(r.group, r.doc_id) for r in drained if r.accepted}
    assert got == want
    # accepted cum_tokens respect the budget; the blocker's would-be
    # total exceeds it
    for r in drained:
        if r.accepted:
            assert r.cum_tokens <= budget
    by_group: dict = {}
    for r in sorted(drained, key=lambda r: (r.group, r.doc_id)):
        by_group.setdefault(r.group, []).append(r)
    for rows in by_group.values():
        seen_reject = False
        for r in rows:
            if seen_reject:
                assert not r.accepted  # permanent block
            if not r.accepted:
                seen_reject = True


def test_budget_gate_stream_rejects_bad_tokens(spark, tmp_path):
    import os

    import pytest

    from spear_spark.streaming import budget_gate_stream

    src = str(tmp_path / "bad_gate")
    os.makedirs(src)
    import pandas as pd

    pd.DataFrame(
        {"doc_id": [1], "tokens": [-5], "source": ["s"]}
    ).to_parquet(os.path.join(src, "a.parquet"))
    schema = "doc_id long, tokens long, source string"
    stream = spark.readStream.schema(schema).parquet(src)
    out = budget_gate_stream(stream, "doc_id", "tokens", "source", 100)
    q = (
        out.writeStream.format("memory")
        .queryName("budget_gate_bad")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="negative tokens|StreamingQuery"):
        q.awaitTermination()
