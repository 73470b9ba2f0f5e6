package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** Streaming execution of the uplift transforms: file source -> watermarked
  * transforms -> memory sink, driven synchronously (SURVEY §2.9).
  */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  // the streaming file source requires a directory; stage the single-file
  // events table into one
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling window agg matches the batch plan") {
    val stream = Streams.readEventStream(spark, eventsDir)
    val got = Streams.runToMemory(
      Streams.tumblingCountsStream(stream), "win_counts", OutputMode.Complete())
    val want = Streams.tumblingCounts(Tables.events(spark, sf0001))
    assert(got.count() == want.count())
    val g = got.orderBy("window_start", "event_type").collect().map(_.toSeq)
    val w = want.orderBy("window_start", "event_type").collect().map(_.toSeq)
    assert(g.toSeq == w.toSeq)
  }

  test("rateAlertBatch: integer alert rule over the zero-filled spine; cold start never alerts") {
    def t(hour: Long) = new java.sql.Timestamp(hour * 3600000L)
    // type "a": hours 0..3 have 2,2,2,10 events; hour 4 silent; hour 5 has 1
    val rows = (Seq.fill(2)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(2)(2L) ++
      Seq.fill(10)(3L) ++ Seq(5L)).map(h => ("a", t(h)))
    val out = Streams.rateAlertBatch(rows.toDF("event_type", "ts"),
        k = 3, num = 3, den = 2)
      .collect().map(r => r.getLong(1) -> (r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toMap
    assert(out.size == 6) // spine hours 0..5, silent hour 4 present
    assert(out(0L) == ((2L, None, false))) // cold start: no prev_sum, no alert
    assert(out(2L) == ((2L, None, false)))
    // hour 3: n=10 vs prev sum 6 -> 10*6 > 6*3: alert
    assert(out(3L) == ((10L, Some(6L), true)))
    assert(out(4L) == ((0L, Some(14L), false))) // silence is a 0-count row
    // hour 5: n=1 vs prev {2,10,0}=12 -> 6 > 36 false
    assert(out(5L) == ((1L, Some(12L), false)))
  }

  test("streaming dedupe emits one row per key within the watermark") {
    val stream = Streams.readEventStream(spark, eventsDir)
    val got = Streams.runToMemory(
      Streams.dedupeStream(stream), "dedup", OutputMode.Append())
    val keys = got.select("user_id", "event_type").collect()
    assert(keys.length == keys.distinct.length)
    val batchKeys = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(keys.length == batchKeys)
  }

  test("sessionizeBatch: gap splits sessions, bounds are per-session") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 7L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 7L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 10:05:00"), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Streams.sessionizeBatch(df).orderBy("user_id", "session_seq").collect()
    assert(got.length == 3) // user 7: two sessions; user 9: one
    assert(got(0).getAs[Long]("n_events") == 2)
    assert(got(1).getAs[Long]("n_events") == 1)
  }

  test("mapGroupsWithState running counts see every event") {
    val stream = Streams.readEventStream(spark, eventsDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streams.Event]
    val got = Streams.runToMemory(
      Streams.runningCountsWithState(stream).toDF(), "running", OutputMode.Update())
    val total = got.agg(sum("n_events")).as[Long].head()
    assert(total == Tables.events(spark, sf0001).count())
  }

  test("latestStateStream: final state equals the batch election across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, sec: Long, v: Double) =
      Streams.Event(id, new java.sql.Timestamp(sec * 1000L), uid, "e", v)
    // same millisecond, different microseconds: the µs-later, id-SMALLER
    // event must win in BOTH engines (catches getTime*1000 ms truncation,
    // under which the tie would fall to the higher id instead)
    def evUs(id: Long, uid: Long, ms: Long, us: Int, v: Double) = {
      val t = new java.sql.Timestamp(ms)
      t.setNanos(((ms % 1000) * 1000000 + us * 1000).toInt)
      Streams.Event(id, t, uid, "e", v)
    }
    val all = Seq(
      ev(1, 1L, 10, 1.0), ev(2, 1L, 20, 2.0),  // batch 1
      ev(3, 1L, 15, 9.0),                       // batch 2: older ts loses
      ev(4, 2L, 5, 7.0),
      ev(5, 2L, 5, 8.0),                        // same ts: higher id wins
      evUs(7, 3L, 42000, 100, 3.0),
      evUs(6, 3L, 42000, 900, 4.0))             // same ms, later µs, lower id
    val input = MemoryStream[Streams.Event]
    val q = Streams.latestStateStream(input.toDS()).toDF()
      .writeStream.format("memory").queryName("latest")
      .outputMode(OutputMode.Update()).start()
    input.addData(all.take(2): _*); q.processAllAvailable()
    input.addData(all.drop(2): _*); q.processAllAvailable()
    q.stop()
    // Update sink appends each batch's emission; last row per key = state
    val fin = spark.table("latest")
      .withColumn("__n", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max_by(struct(col("last_event_id"), col("last_value")),
        col("__n")).as("b"))
      .select(col("user_id"), col("b.last_event_id"), col("b.last_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val batch = Streams.latestStateBatch(
        all.toDF("event_id", "ts", "user_id", "event_type", "value")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(fin == batch)
    assert(batch(1L) == ((2L, 2.0)) && batch(2L) == ((5L, 8.0)))
    assert(batch(3L) == ((6L, 4.0)), "sub-millisecond µs must decide before id")
  }

  test("throttleStream caps per key per window across batches; late events drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, sec: Long) =
      Streams.Event(id, new java.sql.Timestamp(sec * 1000L), uid, "e", 1.0)
    val input = MemoryStream[Streams.Event]
    val q = Streams.throttleStream(input.toDS(), maxPerWindow = 3,
        windowSeconds = 100L, lateWindows = 1)
      .toDF().writeStream.format("memory").queryName("throttle")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 sends 2 events in window [0,100); user 2 sends 4
    // (cap 3 -> lowest-(ts,id) three kept, deterministically)
    input.addData(ev(10, 1L, 5), ev(11, 1L, 6),
      ev(20, 2L, 7), ev(23, 2L, 8), ev(22, 2L, 8), ev(21, 2L, 9))
    q.processAllAvailable()
    // batch 2: user 1 sends 2 more in the SAME window — only 1 slot left
    // (the count state crossed the batch): 12 takes it, 13 drops
    input.addData(ev(12, 1L, 50), ev(13, 1L, 51))
    q.processAllAvailable()
    // batch 3: window [200,300) opens — win 0 falls outside the lateness
    // horizon (lateWindows=1 keeps only [100,200)+)
    input.addData(ev(14, 1L, 250))
    q.processAllAvailable()
    // batch 4: a straggler from window [0,100) is now 2 windows behind -> drops
    input.addData(ev(15, 1L, 20))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("throttle").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted
    // user 2's batch-1 order is (ts, id): 20@7, 22@8, 23@8, 21@9 — so 21 is
    // the deterministic over-cap drop
    assert(got.toSeq == Seq(
      (10L, 1L, 0L, 1), (11L, 1L, 0L, 2), (12L, 1L, 0L, 3),
      (14L, 1L, 200L, 1),
      (20L, 2L, 0L, 1), (22L, 2L, 0L, 2), (23L, 2L, 0L, 3)))
  }

  test("throttleStream admits in sub-millisecond µs order, not ms-truncated id order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // same millisecond, one slot: the µs-EARLIER event (id 7, µs 100) must
    // take it over the µs-later-but-lower-id event (id 6, µs 900) — under
    // ms truncation the tie would fall to id and invert admission
    def evUs(id: Long, us: Int) = {
      val t = new java.sql.Timestamp(42000L)
      t.setNanos(us * 1000)
      Streams.Event(id, t, 1L, "e", 1.0)
    }
    val input = MemoryStream[Streams.Event]
    val q = Streams.throttleStream(input.toDS(), maxPerWindow = 1,
        windowSeconds = 100L, lateWindows = 1)
      .toDF().writeStream.format("memory").queryName("throttle_us")
      .outputMode(OutputMode.Append()).start()
    input.addData(evUs(6, 900), evUs(7, 100))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("throttle_us").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(7L), s"µs-earlier event must win the slot: $kept")
  }

  test("throttle idle-key timeout plumbing: capping unchanged with timeout set") {
    // same rationale as the near-dup timeout test: ProcessingTimeTimeout
    // streams micro-batch continuously (processAllAvailable never drains),
    // so the plumbing is exercised on the batch path — same operator code,
    // timeouts registered but never due in a single pass
    def ev(id: Long, uid: Long, sec: Long) =
      Streams.Event(id, new java.sql.Timestamp(sec * 1000L), uid, "e", 1.0)
    val docs = Seq(ev(1, 7L, 5), ev(2, 7L, 6)).toDS()
    val kept = Streams.throttleStream(docs, maxPerWindow = 1,
        windowSeconds = 100L, idleTimeoutMs = Some(3600000L))
      .collect().map(_.event_id).toSeq
    assert(kept == Seq(1L))
  }

  test("streaming near-dup: cross-batch LSH state finds the duplicate later in the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = Streams.nearDupStream(
      input.toDF().toDF("doc_id", "text"), maxHamming = 3)
    val q = hits.toDF().writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // batch 1: the original + an unrelated doc — no pairs yet
    input.addData((1L, base), (2L, "completely unrelated words about spacecraft navigation"))
    q.processAllAvailable()
    assert(spark.table("neardup").count() == 0)
    // batch 2: a duplicate of doc 1 arrives — state from batch 1 catches it
    // (identical text -> hamming 0 -> all 4 bands collide, deterministically)
    input.addData((3L, base))
    q.processAllAvailable()
    val emitted = spark.table("neardup").collect()
    q.stop()
    val pairs = emitted.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"expected the planted cross-batch pair, got $pairs")
    assert(emitted.forall(_.getInt(2) == 0))
  }

  test("near-dup idle-state timeout plumbing: detection unchanged with timeout set") {
    // idleTimeoutMs switches the operator to ProcessingTimeTimeout, whose
    // streaming cost is continuous micro-batches (Spark runs a batch per
    // trigger to fire due timeouts) — so the plumbing is exercised on the
    // batch path here (same operator code; timeouts registered, never due)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely unrelated words about spacecraft navigation")
    ).toDF("doc_id", "text")
    val pairs = Streams.nearDupStream(docs, maxHamming = 3,
        idleTimeoutMs = Some(600000L))
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected the planted pair, got $pairs")
  }

  test("streaming near-dup state window is bounded: old entries age out") {
    // batch mode (same code path, single pass): capacity 2 per bucket means
    // a doc 3+ identical-docs later no longer pairs with the first one
    val docs = (1 to 5).map(i => (i.toLong, "same text in every single row here"))
      .toDF("doc_id", "text")
    val hits = Streams.nearDupStream(docs, capacity = 2)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each doc pairs only with the <=2 most recent predecessors in its bucket
    assert(hits == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 5L), (4L, 5L)),
      s"got $hits")
  }

  test("streaming canonical-URL dedupe: variants of one page collapse in-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.Web
    // the crawl-frontier use: URL variants arriving over time dedupe on
    // the canonical key. Canonical URLs are an UNBOUNDED key domain, so
    // plain dropDuplicates would grow state forever (it only evicts when
    // the event-time column is part of the key); the correct composition
    // is dropDuplicatesWithinWatermark — one state entry per key within
    // the horizon, evicted after it. normalizeUrl is a pure projection and
    // composes unchanged.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    mem.addData(
      (ts("2024-01-01 10:00:00"), "https://WWW.Example.com:443/page/7/?utm_source=x&b=2&a=1#top"),
      (ts("2024-01-01 10:05:00"), "https://user@www.example.com/page/7?a=1&b=2&fbclid=z"),
      (ts("2024-01-01 10:10:00"), "https://www.example.com/page/7?b=2&a=1"),
      (ts("2024-01-01 10:15:00"), "https://www.example.com/other"))
    val stream = mem.toDF().toDF("ts", "url")
      .withColumn("canonical", Web.normalizeUrl(col("url")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("canonical")
    val got = Streams.runToMemory(stream, "url_dedup", OutputMode.Append())
    val canon = got.select("canonical").as[String].collect().sorted
    assert(canon.toSeq == Seq(
      "https://www.example.com/other",
      "https://www.example.com/page/7?a=1&b=2"), canon.mkString(","))
  }

  // the dedupeWithinWatermarkStream eviction scenario, shared by the
  // semantics test and the RocksDB provider-invariance test: returns the
  // emitted (key, emission-count) map after driving three micro-batches
  private def driveWmDedup(name: String, useRocksDb: Boolean): Map[String, Long] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val stream = Streams.dedupeWithinWatermarkStream(
      mem.toDF().toDF("ts", "k"), Seq("k"), lateness = "1 hour")
    def drive(): Unit = {
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      // batch 1: A's first sighting, a same-batch in-horizon duplicate, B
      mem.addData((ts("2024-01-01 10:00:00"), "A"),
        (ts("2024-01-01 10:30:00"), "A"), (ts("2024-01-01 10:10:00"), "B"))
      q.processAllAvailable()
      // batch 2: a cross-batch in-horizon duplicate of A still drops
      // (watermark is 9:30 here, A's state live); C advances the
      // watermark to 19:00 for the NEXT batch -> A's 11:00 expiry evicts
      mem.addData((ts("2024-01-01 20:00:00"), "C"),
        (ts("2024-01-01 10:40:00"), "A"))
      q.processAllAvailable()
      // batch 3: A re-arrives AFTER eviction with a fresh event time ->
      // emits again (the by-TIME first-wins trade, proven through the
      // actual state eviction)
      mem.addData((ts("2024-01-01 19:30:00"), "A"))
      q.processAllAvailable()
      if (useRocksDb) {
        assert(q.recentProgress.exists(_.json.contains("rocksdb")),
          "rocksdb metrics absent from progress — provider not engaged")
      }
      q.stop()
    }
    if (useRocksDb) Streams.withRocksDbStateStore(spark)(drive()) else drive()
    spark.table(name).groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("dedupeWithinWatermarkStream: in-horizon dups drop (same and cross " +
    "batch), state EVICTS after the horizon, batch face is exact dedup") {
    val got = driveWmDedup("wm_dedup_default", useRocksDb = false)
    // A: first sighting + post-eviction re-arrival = 2; B, C once each
    assert(got == Map("A" -> 2L, "B" -> 1L, "C" -> 1L), got.toString)
    // batch face: plain exact dedup on the keys (a bounded batch sits
    // entirely inside the horizon)
    val batch = Seq((ts("2024-01-01 10:00:00"), "A"),
      (ts("2024-01-01 10:30:00"), "A"), (ts("2024-01-01 10:10:00"), "B"))
      .toDF("ts", "k")
    val b = Streams.dedupeWithinWatermarkStream(batch, Seq("k"))
    assert(!b.isStreaming && b.count() == 2L)
    // the ts-in-keys contract violation raises loudly — including a
    // case-variant name, which Spark would resolve to the same column
    for (bad <- Seq("ts", "TS")) {
      val ex = intercept[IllegalArgumentException] {
        Streams.dedupeWithinWatermarkStream(batch, Seq("k", bad))
      }
      assert(ex.getMessage.contains("must not be a dedupe key"), ex.getMessage)
    }
  }

  test("RocksDB state store opt-in: stateful results are provider-" +
    "invariant and the provider actually engages") {
    // 1) the evicting dedupe scenario emits the IDENTICAL multiset under
    // RocksDB (state store is a substrate, not a semantics knob)
    val rocks = driveWmDedup("wm_dedup_rocks", useRocksDb = true)
    assert(rocks == Map("A" -> 2L, "B" -> 1L, "C" -> 1L), rocks.toString)
    // 2) a windowed-aggregation state shape too: sliding counts under
    // RocksDB match the batch plan exactly
    val stream = Streams.readEventStream(spark, eventsDir)
    val got = Streams.runToMemory(Streams.slidingCountsStream(stream),
      "slide_counts_rocks", OutputMode.Complete(), useRocksDb = true)
    val want = Streams.slidingCounts(Tables.events(spark, sf0001))
    assert(got.orderBy("window_start_us", "event_type").collect().map(_.toSeq).toSeq ==
      want.orderBy("window_start_us", "event_type").collect().map(_.toSeq).toSeq)
    // the session conf is restored to the default provider after the
    // scoped runs (getOption surfaces the conf DEFAULT, never None here)
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("HDFSBackedStateStoreProvider"))
  }

  test("stateless curation ops run unchanged on a stream (pii/quality/boilerplate/chunks)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.{Curation, TextAnalysis => TA}
    // the curation surface is pure per-row projection, so the SAME code must
    // execute under a streaming source with no plan rewrite — the property
    // that lets a corpus pipeline run identically in backfill and ingest
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "Write to admin@example.org now.\nHome | About\nThe quick brown fox jumps high today."),
      (2L, "plain words with no personal data at all\nmenu"),
      (3L, (1 to 150).map(i => s"tok$i").mkString(" ")))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val stream = mem.toDF().toDF("doc_id", "text")
    def curateAll(df: org.apache.spark.sql.DataFrame) = {
      val stats = Curation.boilerplateStats(df, "doc_id", "text")
      df.select(col("doc_id"),
          Curation.piiRedact(col("text")).as("redacted"),
          TA.qualityScore(col("text")).as("quality"),
          TA.charEntropy(col("text")).as("entropy"))
        .join(stats, "doc_id")
    }
    // boilerplateStats is also a pure projection, so the join below is
    // stream-stream ONLY in form; the same builder runs on both inputs
    val streamed = Streams.runToMemory(
      curateAll(stream), "curate_stream", OutputMode.Append())
    val batch = curateAll(docs.toDF("doc_id", "text"))
    val g = streamed.orderBy("doc_id").collect().map(_.toSeq)
    val w = batch.orderBy("doc_id").collect().map(_.toSeq)
    assert(g.toSeq == w.toSeq)
    // chunking explodes under streaming too (flatMap-shaped projection)
    val chunks = Streams.runToMemory(
      Curation.chunkByTokens(stream, "doc_id", "text", window = 64, stride = 48),
      "chunk_stream", OutputMode.Append())
    assert(chunks.count() ==
      Curation.chunkByTokens(docs.toDF("doc_id", "text"), "doc_id", "text", 64, 48).count())
  }

  test("enrichStream: stream-stream join pairs within the time bound only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = MemoryStream[(Long, java.sql.Timestamp)]
    val lookups = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = Streams.enrichStream(
      events.toDS().toDF("user_id", "ts"),
      lookups.toDS().toDF("user_id", "ts", "tag"),
      "user_id", joinWindowSec = 60L)
    val q = joined.writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append()).start()
    // lookups: u1 tagged at 100 and (stale) at 0; u2 tagged at 500
    lookups.addData((1L, t(100), "a"), (1L, t(0), "old"), (2L, t(500), "b"))
    // events: u1 at 130 (within 60s of tag@100, 130s after tag@0),
    // u1 at 90 (BEFORE tag@100 -> no match), u2 at 560, u3 at 130
    events.addData((1L, t(130)), (1L, t(90)), (2L, t(560)), (3L, t(130)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich")
      .select("user_id", "l_tag").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b")),
      s"only in-window same-key pairs join: $got")
    // batch face: identical builder, identical result
    val be = Seq((1L, t(130)), (1L, t(90)), (2L, t(560)), (3L, t(130)))
      .toDF("user_id", "ts")
    val bl = Seq((1L, t(100), "a"), (1L, t(0), "old"), (2L, t(500), "b"))
      .toDF("user_id", "ts", "tag")
    val batch = Streams.enrichStream(be, bl, "user_id", 60L)
      .select("user_id", "l_tag").as[(Long, String)].collect().sorted.toSeq
    assert(batch == got, "batch face must agree with the streamed result")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native session_window: STREAMING execution matches the batch face") {
    val stream = Streams.readEventStream(spark, eventsDir)
      .withWatermark("ts", "1 hour")
    val agg = stream
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        col("session_window.start").as("s"), col("session_window.end").as("e"))
    val got = Streams.runToMemory(agg, "native_sessions", OutputMode.Complete())
    val want = Tables.events(spark, sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        col("session_window.start").as("s"), col("session_window.end").as("e"))
    val g = got.orderBy("user_id", "s").collect().map(_.toSeq).toSeq
    val w = want.orderBy("user_id", "s").collect().map(_.toSeq).toSeq
    assert(g == w)
  }

  test("intervalUnion: overlap merges, touching merges, nesting collapses, gaps split") {
    import graft.pipeline.EventAnalytics
    val iv = Seq(
      ("u", 0L, 10L, 1L), ("u", 5L, 20L, 2L),   // overlap -> [0,20]
      ("u", 20L, 30L, 3L),                       // touching: merges (closed)
      ("u", 22L, 25L, 4L),                       // nested
      ("u", 40L, 50L, 5L),                       // gap -> new island
      ("v", 0L, 1L, 6L)
    ).toDF("k", "s", "e", "id")
    val out = EventAnalytics.intervalUnion(iv, "k", col("s"), col("e"), "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("u") == ((5L, 2L, 40L))) // [0,30] + [40,50] = 30 + 10
    assert(out("v") == ((1L, 1L, 1L)))
  }

  test("slidingCounts enforces width = k * slide loudly; compliant " +
    "off-default durations still build") {
    val ev = Tables.events(spark, sf0001)
    // 5h/2h: Spark would accept it, but the explode-into-k-windows oracle
    // replay and the width/slide state bound would silently diverge
    val ex = intercept[IllegalArgumentException] {
      Streams.slidingCounts(ev, width = "5 hours", slide = "2 hours")
    }
    assert(ex.getMessage.contains("integer multiple"), ex.getMessage)
    // month intervals have no fixed microsecond length -> rejected
    val exM = intercept[IllegalArgumentException] {
      Streams.slidingCounts(ev, width = "1 month", slide = "1 week")
    }
    assert(exM.getMessage.contains("month-free"), exM.getMessage)
    // a compliant non-default pair parses and builds (90 = 2 * 45)
    assert(Streams.slidingCounts(ev, "90 minutes", "45 minutes")
      .columns.toSeq == Seq("window_start_us", "event_type", "n"))
  }

  test("sliding-window counts: streaming Complete-mode output matches the batch plan") {
    val stream = Streams.readEventStream(spark, eventsDir)
    val got = Streams.runToMemory(
      Streams.slidingCountsStream(stream), "slide_counts",
      OutputMode.Complete())
    val want = Streams.slidingCounts(Tables.events(spark, sf0001))
    val g = got.orderBy("window_start_us", "event_type").collect().map(_.toSeq)
    val w = want.orderBy("window_start_us", "event_type").collect().map(_.toSeq)
    assert(g.toSeq == w.toSeq)
    // the overlap invariant: every event lands in exactly width/slide = 2
    // windows, so total mass doubles the event count
    val total = want.agg(sum("n")).head.getLong(0)
    assert(total == 2L * Tables.events(spark, sf0001).count())
  }

  test("chained window-of-window aggregation streams in append mode; " +
    "emitted days match the batch peaks exactly") {
    // two stateful window aggs in ONE streaming plan (hour tier ->
    // window_time -> day tier): append mode + watermark; a day's peak
    // emits once the day window falls fully below the watermark, so the
    // single-file drive emits every day except the spine's last
    val stream = Streams.readEventStream(spark, eventsDir)
    val got = Streams.runToMemory(
      Streams.hourlyPeakPerDayStream(stream), "day_peaks",
      OutputMode.Append())
    val batch = Streams.hourlyPeakPerDay(Tables.events(spark, sf0001))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val maxUs = Tables.events(spark, sf0001)
      .agg(max(unix_micros(col("ts")))).head.getLong(0)
    val watermarkUs = maxUs - 2L * 3600000000L
    val emitted = got.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every emitted day agrees with batch, and every fully-closed day
    // (end <= watermark) was emitted
    assert(emitted.forall { case (d, v) => batch.get(d).contains(v) },
      s"append emissions diverge from batch: $emitted")
    val closed = batch.keys.filter(_ + 86400000000L <= watermarkUs).toSet
    assert(closed.subsetOf(emitted.keySet),
      s"closed days missing from append output: ${closed -- emitted.keySet}")
    assert(closed.nonEmpty, "spine too short to close any day")
  }

  test("left-outer stream-stream join: matches emit inner-style, " +
    "unmatched rows null-extend only after watermark eviction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, uid: Long, sec: Long, typ: String) =
      Streams.Event(id, new java.sql.Timestamp(sec * 1000L), uid, typ, 1.0)
    val input = MemoryStream[Streams.Event]
    val src = input.toDS().toDF()
    val purchases = src.filter(col("event_type") === "purchase")
    val views = src.filter(col("event_type") === "view")
      .select(col("event_id"), col("ts"), col("user_id"))
    val joined = Streams.enrichStream(purchases, views, "user_id",
        joinWindowSec = 3600L, lateness = "1 hour",
        joinType = "left_outer")
      .select(col("event_id").as("purchase_id"),
        col("l_event_id").as("view_id"))
    val q = joined.writeStream.format("memory").queryName("outer_attr")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 views at t=1800 then purchases at t=3600 (match);
    // user 2 purchases at t=3700 with no view in the prior hour
    input.addData(ev(10, 1L, 1800, "view"), ev(20, 1L, 3600, "purchase"),
      ev(30, 2L, 3700, "purchase"))
    q.processAllAvailable()
    val afterB1 = spark.table("outer_attr").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(afterB1.get(20L).contains(Some(10L)),
      s"inner match must emit in its own micro-batch: $afterB1")
    assert(!afterB1.contains(30L),
      "unmatched row must NOT emit before the watermark proves no match")
    // batches 2-3: far-future events on BOTH sides (the global watermark
    // is the MIN across the two watermark nodes — advancing only the
    // view side would leave the purchase side's watermark, and eviction,
    // stuck) push it past 3700 + 1h window + 1h lateness -> user 2's
    // purchase evicts null-extended
    input.addData(ev(40, 9L, 40000, "view"), ev(45, 9L, 40000, "purchase"))
    q.processAllAvailable()
    input.addData(ev(41, 9L, 50000, "view"), ev(46, 9L, 50000, "purchase"))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("outer_attr").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fin.get(30L).contains(None),
      s"evicted unmatched purchase must null-extend: $fin")
    assert(fin(20L) == Some(10L), s"outer output: $fin")
    assert(fin.get(45L).contains(Some(40L)),
      s"same-batch match must emit inner-style: $fin")
  }

  test("windowedTopKBatch: per-hour ranks, (count, type) tiebreak, k cut") {
    import spark.implicits._
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 10: a x3, b x1, c x1 (b/c tie -> b first); hour 11: c x2
    val df = (Seq.fill(3)(ts(10, 5) -> "a") ++ Seq(ts(10, 10) -> "b") ++
      Seq(ts(10, 20) -> "c") ++ Seq.fill(2)(ts(11, 0) -> "c"))
      .toDF("ts", "event_type")
    val got = Streams.windowedTopKBatch(df, k = 2)
      .orderBy("hour", "rank").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", 3L), (2, "b", 1L), (1, "c", 2L)))
  }
}
