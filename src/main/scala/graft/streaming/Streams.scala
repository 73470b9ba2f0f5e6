package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming uplift (SURVEY §2.9): the reference's "streaming" is
  * pull-based file iteration with no watermarks/windows/state; these are the
  * genuinely-streaming equivalents of its bounded-memory idioms, plus the
  * windowed aggregations a training-data event pipeline needs.
  *
  * Every transform here is defined on a plain DataFrame so the SAME code
  * serves batch tables and `readStream` sources — correctness is oracle-
  * checked on the batch path, streaming execution is spec-checked with a
  * memory sink.
  */
object Streams {

  /** File-source stream over a directory of parquet events.
    *
    * A file stream needs its schema up front, but events.ts has shipped as
    * both TIMESTAMP(NANOS)-as-long and TIMESTAMP_NTZ micros across driver
    * testdata generations (see [[graft.Tables.events]]) — so sniff the
    * on-disk schema with ONE batch footer read, then normalize ts through
    * the same shared rule the batch loader uses. Nanos files still require
    * `spark.sql.legacy.parquet.nanosAsLong=true` at SESSION BUILD (the
    * sniff read itself enforces it); NTZ files require a UTC session zone. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val onDisk = spark.read.parquet(dir).schema
    graft.Tables.normalizeEventTs(spark,
      spark.readStream.schema(onDisk).parquet(dir))
  }

  /** Tumbling-window aggregation (works batch or streaming; add
    * `withWatermark` upstream for append-mode streams). */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(24, 6))).cast(DoubleType).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Watermarked streaming variant: late data beyond `lateness` is dropped,
    * state is bounded — the scale-correct form of the reference's
    * "bounded buffer" memory hacks. */
  def tumblingCountsStream(events: DataFrame, width: String = "1 hour",
                           lateness: String = "2 hours"): DataFrame =
    tumblingCounts(events.withWatermark("ts", lateness), width)

  /** Rate-anomaly alert over the tumbling-count series (the batch face of
    * [[tumblingCountsStream]]'s monitoring layer): per (event_type, hour),
    * flag windows whose count exceeds `num/den` × the trailing-`k`-window
    * mean. The alert rule is the INTEGER inequality den·k·n > num·Σprev —
    * no float mean near the decision — over the ZERO-FILLED hour spine
    * (silence is a 0-count window, exactly what an alerting layer must
    * see). Windows without `k` full predecessors don't alert (cold start).
    * The spine is |types| × hours — calendar-bounded; the lag window
    * partitions per type. Returns (event_type, hour, n, prev_sum, alert).
    */
  def rateAlertBatch(events: DataFrame, k: Int = 3,
                     num: Int = 3, den: Int = 2): DataFrame = {
    require(k >= 1 && num > 0 && den > 0, s"bad alert config: $k $num/$den")
    val hour = floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long")
    val counts = events.select(col("event_type"), hour.as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
    val spine = counts.agg(min(col("hour")).as("__lo"), max(col("hour")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("hour"))
      .crossJoin(counts.select("event_type").distinct())
    val filled = spine.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour").asc)
    val wPrev = w.rowsBetween(-k, -1)
    filled
      .withColumn("__rn", row_number().over(w))
      .withColumn("prev_sum", sum(col("n")).over(wPrev))
      .withColumn("alert", col("__rn") > k &&
        col("n") * (den.toLong * k) > col("prev_sum") * num.toLong)
      .select(col("event_type"), col("hour"), col("n"),
        when(col("__rn") > k, col("prev_sum")).as("prev_sum"), col("alert"))
  }

  /** Top-k event types per tumbling hour — the trending/monitoring board.
    * The COUNT stage is [[tumblingCountsStream]]'s shape (watermarked
    * window groupBy — streams in update mode, state evicts); the RANK
    * stage is a per-window window function (rank windows aren't
    * stream-appendable in Spark, so a streaming deployment ranks in the
    * sink/foreachBatch — this is the batch/backfill face of that split,
    * and the split itself is the scale design: counts are the only
    * corpus-sized work, ranking touches |windows|×|types| cells). Ties
    * break (n DESC, type ASC). Returns (hour, rank, event_type, n). */
  def windowedTopKBatch(events: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val hour = floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long")
    val counts = events.select(col("event_type"), hour.as("hour"))
      .groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("hour"))
      .orderBy(col("n").desc, col("event_type").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("hour"), col("rank"), col("event_type"), col("n"))
  }

  /** Streaming dedupe: EXACT global dedup on (user_id, event_type) — the
    * principled version of `unique`'s 4096-row window (process.py:851-898).
    * State is one entry per distinct KEY, so this form is for bounded key
    * domains (user x event_type here); without the event-time column in
    * the keys the watermark only drops late input, it does not evict
    * dedup state. For unbounded key domains (URLs, fingerprints) use
    * `dropDuplicatesWithinWatermark` instead — exact within the horizon,
    * state evicted after it (StreamsSpec's canonical-URL case). */
  def dedupeStream(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicates("user_id", "event_type")

  /** Streaming dedupe for UNBOUNDED key domains — the true streaming face
    * of P4 `unique` (the reference's fixed-size FIFO dedupe buffer —
    * deque append-only eviction by first sighting, no recency promotion;
    * process.py:851-898, bufsize=4096): `dropDuplicatesWithinWatermark`
    * keeps ONE state row per key seen within the `lateness` horizon of
    * the `tsCol` watermark and EVICTS it once the watermark passes the
    * first sighting — state is bounded by arrival-rate × horizon, never
    * by the key domain (the bound a cluster can actually hold for
    * canonical URLs / content fingerprints). Semantics: exact within the
    * horizon; a duplicate arriving after its key's state evicted emits
    * again — the same first-wins-within-a-window trade the reference's
    * 4096-row buffer makes by SIZE, made here by TIME (and therefore
    * meaningful under out-of-order arrival). `tsCol` must NOT be in
    * `keys` (that would make every event distinct). Batch face: plain
    * exact dropDuplicates on the keys — a bounded batch sits entirely
    * inside the horizon, so the time bound degenerates to exact dedup
    * (q06's operator), keeping the batch/stream duality. */
  def dedupeWithinWatermarkStream(events: DataFrame, keys: Seq[String],
                                  lateness: String = "2 hours",
                                  tsCol: String = "ts"): DataFrame = {
    require(keys.nonEmpty, "at least one dedupe key")
    // case-INSENSITIVE compare: Spark resolves column names case-
    // insensitively by default, so a "TS" key would silently resolve to
    // the event-time column and void the time bound this guard protects
    require(!keys.exists(_.equalsIgnoreCase(tsCol)),
      s"the watermark column '$tsCol' must not be a dedupe key: within-" +
        "watermark dedup bounds state by TIME precisely because the key " +
        "set excludes event time")
    if (events.isStreaming)
      events.withWatermark(tsCol, lateness)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)
  }

  /** Watermarked STREAM-STREAM inner join: enrich each event with the
    * `lookups` rows for the same key whose event time falls within
    * `joinWindowSec` seconds BEFORE the event (state-feasible streaming
    * enrichment — click↔impression attribution, request↔response pairing).
    * Both sides are watermarked and the join condition bounds the
    * event-time gap, so Spark can evict buffered rows once the watermark
    * passes `ts − joinWindowSec` — without the bound, stream-stream join
    * state grows forever. Lookup columns (other than the key) arrive
    * prefixed `l_`. Works identically on batch DataFrames (the oracle
    * face: a plain bounded interval join).
    *
    * `joinType = "left_outer"` keeps the UNMATCHED event rows too (the
    * organic-conversion side of attribution) — the semantics that
    * genuinely distinguish outer from inner stream-stream joins: an
    * inner match emits the micro-batch it meets, but an unmatched left
    * row emits (null-extended) only once the watermark PROVES no
    * in-window lookup can still arrive and its state evicts. */
  def enrichStream(events: DataFrame, lookups: DataFrame, keyCol: String,
                   joinWindowSec: Long, lateness: String = "1 hour",
                   joinType: String = "inner"): DataFrame = {
    require(joinWindowSec > 0)
    require(Set("inner", "left_outer")(joinType),
      s"joinType must be inner|left_outer: $joinType")
    val streaming = events.isStreaming || lookups.isStreaming
    val l0 = lookups.columns.foldLeft(lookups)((df, c) =>
      df.withColumnRenamed(c, s"l_$c"))
    val (e, l) =
      if (streaming) (events.withWatermark("ts", lateness),
        l0.withWatermark("l_ts", lateness))
      else (events, l0)
    e.join(l, col(keyCol) === col(s"l_$keyCol") &&
      col("l_ts") >= col("ts") - expr(s"INTERVAL $joinWindowSec SECONDS") &&
      col("l_ts") <= col("ts"), joinType)
      .drop(s"l_$keyCol")
  }

  /** Gap-based sessionization, batch form: a session breaks after `gapMin`
    * minutes of inactivity. Pure window functions — one shuffle on user_id. */
  def sessionizeBatch(events: DataFrame, gapMin: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // µs precision on both sides of the oracle compare (whole-second casts
    // would disagree with DuckDB's fractional epoch at the gap boundary)
    val newSession = when(
      unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser) >
        gapMin * 60L * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("session_seq", sum(coalesce(newSession, lit(0))).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        date_trunc("second", min(col("ts"))).as("session_start"),
        date_trunc("second", max(col("ts"))).as("session_end"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(count: Int, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Int)

  /** Custom streaming state: per-user running event counts with processing-
    * time timeout — the `mapGroupsWithState` escape hatch for semantics the
    * built-in windows can't express. */
  def runningCountsWithState(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0, 0L))
          val evs = rows.toSeq
          val next = SessionState(prev.count + evs.size,
            math.max(prev.lastTs, evs.map(_.ts.getTime).max))
          state.update(next)
          SessionOut(uid, next.count)
      }
  }

  final case class NearDupHit(id_a: Long, id_b: Long, hamming: Int, band: Int)

  /** Streaming near-duplicate detection: banded SimHash LSH with per-bucket
    * bounded state — each incoming document is checked against the last
    * `capacity` signatures that landed in any of its 4 band buckets, and
    * verified pairs (hamming <= maxHamming) are emitted as they arrive.
    * This is the genuinely-streaming version of the reference's bounded
    * 4096-row LRU `unique` window (process.py:851-898): state per
    * (band,bucket) is a FIFO of (id, signature) LONGS — never text — so
    * total state is bounded by 4 x capacity x live-buckets regardless of
    * stream length. Worst case with no timeout: 4 bands x 65536 buckets x
    * capacity entries x 16 bytes ≈ 1 GiB per 256 capacity — pass
    * `idleTimeoutMs` on a long-lived stream so buckets no document has hit
    * for that long are dropped (processing-time timeout; a revived bucket
    * simply restarts empty, trading a missed pair against an old document
    * for bounded live state — the same trade the reference's LRU makes).
    * Cost of enabling it: Spark schedules micro-batches continuously to
    * fire due timeouts (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    * unconditionally true for processing-time timeouts), so pair it with a
    * real `Trigger.ProcessingTime(...)` rather than the default
    * as-fast-as-possible trigger.
    *
    * A pair colliding in several bands is emitted once per matching band
    * (per-bucket state cannot see other buckets); `band` is carried so a
    * downstream exact dedupe — or the batch [[graft.pipeline.Dedup]]
    * paths — can collapse multiplicity. Works identically on batch
    * Datasets (state lives for the single pass). */
  def nearDupStream(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", maxHamming: Int = 3,
                    capacity: Int = 256,
                    idleTimeoutMs: Option[Long] = None): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // signature + banding shared with the batch path (Dedup.simhashDedup):
    // tokenization or band-layout changes cannot diverge between the two
    val banded = docs.select(col(idCol).cast("long").as("id"),
        graft.pipeline.Dedup.simhashSig(col(textCol)).as("sh"))
      .select(col("id"), col("sh"),
        explode(graft.pipeline.Dedup.simhashBandArray(col("sh"))).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"),
        col("bb.bucket").cast(IntegerType).as("bucket"))
      .as[(Long, Long, Int, Int)]
    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (_, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[List[(Long, Long)], NearDupHit](
        OutputMode.Append, timeoutConf) {
        case (_, _, state: GroupState[List[(Long, Long)]]) if state.hasTimedOut =>
          // idle bucket: reclaim its FIFO; a later hit restarts it empty
          state.remove()
          Iterator.empty
        case ((band, _), rows, state: GroupState[List[(Long, Long)]]) =>
          var window = state.getOption.getOrElse(Nil)
          var wlen = window.length
          val out = scala.collection.mutable.ArrayBuffer[NearDupHit]()
          // sort the trigger's rows by id: groupByKey delivers them in
          // shuffle-fetch order, which is not deterministic — without the
          // sort, WHICH entries fall inside an over-capacity bucket's scan
          // window would vary run to run (cross-batch order stays temporal
          // by design: the state is "recent history")
          rows.toSeq.sortBy(_._1).foreach { case (id, sh, _, _) =>
            var scanned = 0
            var w = window
            // compare against at most `capacity` most-recent entries
            while (w.nonEmpty && scanned < capacity) {
              val (pid, psh) = w.head
              val h = java.lang.Long.bitCount(sh ^ psh)
              if (h <= maxHamming && pid != id)
                out += NearDupHit(math.min(id, pid), math.max(id, pid), h, band)
              w = w.tail; scanned += 1
            }
            window = (id, sh) :: window
            wlen += 1
            // amortized truncation: copying the list per row would make
            // hot-bucket maintenance O(n*capacity); truncate only when it
            // doubles past the cap
            if (wlen > capacity * 2) { window = window.take(capacity); wlen = capacity }
          }
          state.update(if (wlen > capacity) window.take(capacity) else window)
          idleTimeoutMs.foreach(state.setTimeoutDuration)
          out.iterator
      }
  }

  final case class ThrottleState(maxWin: Long, counts: Map[Long, Int])
  final case class Kept(event_id: Long, user_id: Long, win_start: Long,
      seq_in_win: Int)

  /** Per-key event-time rate limiter: keep at most `maxPerWindow` events
    * per key per tumbling `windowSeconds` window — the streaming
    * counterpart of the batch per-domain cap (Curation.capPerGroup), for
    * ingest-side quota enforcement. Emits kept rows with their window and
    * 1-based sequence number; over-quota and too-late rows drop.
    *
    * State per key is a count map over at most `lateWindows + 1` recent
    * windows (~32 bytes each); total state therefore grows with LIVE KEY
    * CARDINALITY, not stream length. On an open-ended stream where new
    * keys keep appearing, pass `idleTimeoutMs` so keys idle that long are
    * evicted — semantically free, because a returning key's old windows
    * are behind the lateness horizon anyway (same trade, and same
    * continuous-micro-batch cost note, as nearDupStream's idle timeout).
    * An event more than `lateWindows` windows behind the key's newest
    * seen window drops as late (its window's count may already be
    * evicted, so the cap could not be enforced fairly).
    * Within a micro-batch, rows process in (ts, event_id) order so WHICH
    * rows survive the cap is deterministic — groupByKey delivers
    * shuffle-fetch order otherwise (same discipline as nearDupStream's
    * in-batch sort). Cross-batch, arrival order is the stream's semantic:
    * the counts persist, so the cap holds across batches wherever the
    * events land. Works identically on a batch Dataset (single pass). */
  def throttleStream(events: Dataset[Event], maxPerWindow: Int,
                     windowSeconds: Long = 3600L,
                     lateWindows: Int = 2,
                     idleTimeoutMs: Option[Long] = None): Dataset[Kept] = {
    require(maxPerWindow >= 1 && windowSeconds >= 1 && lateWindows >= 0)
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ThrottleState, Kept](
        OutputMode.Append, timeoutConf) {
        case (_, _, state: GroupState[ThrottleState]) if state.hasTimedOut =>
          // idle key: reclaim its counters; if it returns, its old windows
          // are behind the lateness horizon regardless
          state.remove()
          Iterator.empty
        case (uid, rows, state: GroupState[ThrottleState]) =>
          var st = state.getOption.getOrElse(ThrottleState(Long.MinValue, Map.empty))
          val out = scala.collection.mutable.ArrayBuffer[Kept]()
          val horizon = lateWindows.toLong * windowSeconds
          // admission order is the (event-time µs, id) total order —
          // getTime alone truncates to ms and would invert same-ms events
          // (the latestStateStream lesson)
          rows.toSeq.sortBy(e => (Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
            e.ts.getNanos / 1000L, e.event_id)).foreach { e =>
            val win = math.floorDiv(e.ts.getTime, 1000L * windowSeconds) * windowSeconds
            if (st.maxWin == Long.MinValue || win >= st.maxWin - horizon) {
              val newMax = math.max(st.maxWin, win)
              // evict windows that fell below the new lateness horizon
              val counts0 =
                if (newMax > st.maxWin)
                  st.counts.filter { case (w, _) => w >= newMax - horizon }
                else st.counts
              val c = counts0.getOrElse(win, 0)
              if (c < maxPerWindow) {
                out += Kept(e.event_id, uid, win, c + 1)
                st = ThrottleState(newMax, counts0.updated(win, c + 1))
              } else st = ThrottleState(newMax, counts0)
            } // else: too late — drop, state untouched
          }
          state.update(st)
          idleTimeoutMs.foreach(state.setTimeoutDuration)
          out.iterator
      }
  }

  /** The RocksDB state store provider as a NAMED opt-in — the 100 TB
    * state-size answer for the stateful builders above: keyed state lives
    * off-heap in RocksDB and spills to executor-local disk instead of the
    * default in-JVM-memory HDFS-backed map, so state size is bounded by
    * disk, not executor heap (the provider every large-state production
    * stream runs). Results are PROVIDER-INVARIANT — the store is a
    * key-value substrate under the same operators (StreamsSpec proves
    * batch-identical output and that the provider actually engaged via
    * the query's rocksdb progress metrics). Apply with
    * [[withRocksDbStateStore]] (or set these on the session / in
    * `spark-defaults` cluster-wide; add
    * `...stateStore.rocksdb.changelogCheckpointing.enabled=true` in
    * production for incremental checkpoints). */
  val rocksDbStateStoreConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Runs `body` (which should START its streaming queries inside) with
    * [[rocksDbStateStoreConfs]] applied to the session, restoring the
    * prior values after — streaming queries capture the provider at
    * .start(), so scoping the session conf is the per-query opt-in.
    * CAVEAT: the provider conf is SESSION-global (Spark offers no
    * per-query surface for it), so query starts must be serialized with
    * respect to this scope — a query concurrently .start()ed on the same
    * session from another thread would capture whichever provider is set
    * at that instant. Cluster deployments that mix providers should use
    * separate sessions (`spark.newSession()`) per provider instead. */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val prior = rocksDbStateStoreConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    rocksDbStateStoreConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Run a streaming DataFrame to completion against a memory sink
    * (synchronous; used by specs and local smoke). `useRocksDb = true`
    * scopes the run under [[withRocksDbStateStore]]. */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Complete(),
                  useRocksDb: Boolean = false): DataFrame = {
    def drive(): DataFrame = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(outputMode).start()
      q.processAllAvailable()
      q.stop()
      df.sparkSession.table(name)
    }
    if (useRocksDb) withRocksDbStateStore(df.sparkSession)(drive())
    else drive()
  }

  final case class KeyedLatest(user_id: Long, last_event_id: Long,
      last_value: Double)
  final case class LatestState(us: Long, id: Long, value: Double)

  /** Streaming keep-latest materialized view: per key, state holds the
    * (event-time µs, id)-max row's payload — the streaming form of the
    * q68 keep-latest upsert / CDC "current state" table, emitted in
    * Update mode every micro-batch the key changes. Election order
    * (ts, event_id) matches the batch operator exactly, so after any
    * batch split the final state is IDENTICAL to [[latestStateBatch]]
    * over the concatenated input (StreamsSpec pins it). State is one
    * fixed-size record per live key. */
  def latestStateStream(events: Dataset[Event]): Dataset[KeyedLatest] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[LatestState, KeyedLatest](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[LatestState]) =>
          // true microseconds, not getTime*1000 (which truncates to ms and
          // mis-elects between same-millisecond events): floorDiv for
          // pre-epoch correctness + the sub-ms nanos remainder
          val best = (state.getOption.iterator ++ rows.map(e =>
            LatestState(Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
              e.ts.getNanos / 1000L, e.event_id, e.value)))
            .maxBy(s => (s.us, s.id))
          state.update(best)
          KeyedLatest(uid, best.id, best.value)
      }
  }

  /** Batch companion of [[latestStateStream]]: one keyed max_by election
    * on (event-time µs, id). Returns (user_id, last_event_id,
    * last_value). */
  def latestStateBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(max_by(struct(col("event_id").as("id"), col("value")),
        struct(unix_micros(col("ts")).as("us"), col("event_id").as("id")))
        .as("__b"))
      .select(col("user_id"), col("__b.id").as("last_event_id"),
        col("__b.value").as("last_value"))

  /** SLIDING-window counts (width > slide ⇒ overlapping windows; each
    * event lands in width/slide of them — the smoothing form of
    * [[tumblingCounts]], the monitoring default when a burst must not
    * vanish at a tumbling boundary). Same batch/stream duality: add
    * `withWatermark` upstream (or use [[slidingCountsStream]]) and the
    * state Spark keeps is one row per OPEN (window, type) cell — the
    * overlap multiplies state by width/slide, not by the data.
    * `width` must be an integer multiple of `slide` — ENFORCED here, not
    * just documented (the oracle's explode-into-k-windows replay and the
    * width/slide state-bound claim are exact only then; Spark itself
    * allows any pair). Window starts report as exact epoch
    * MICROSECONDS. Returns (window_start_us, event_type, n). */
  def slidingCounts(events: DataFrame, width: String = "6 hours",
                    slide: String = "3 hours"): DataFrame = {
    def us(s: String): Long = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
      require(iv.months == 0,
        s"sliding window durations must be month-free: '$s'")
      iv.days * 86400000000L + iv.microseconds
    }
    val (widthUs, slideUs) = (us(width), us(slide))
    require(slideUs > 0 && widthUs > 0 && widthUs % slideUs == 0,
      s"width ('$width' = ${widthUs}us) must be an integer multiple of " +
        s"slide ('$slide' = ${slideUs}us): the explode-into-k-windows " +
        "oracle replay and the width/slide state bound hold only then")
    events.groupBy(window(col("ts"), width, slide).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"))
  }

  /** Watermarked streaming variant of [[slidingCounts]]. */
  def slidingCountsStream(events: DataFrame, width: String = "6 hours",
                          slide: String = "3 hours",
                          lateness: String = "2 hours"): DataFrame =
    slidingCounts(events.withWatermark("ts", lateness), width, slide)

  /** CHAINED windowed aggregation (window-of-window, the Spark 3.4+
    * multi-stateful-operator surface): hourly tumbling counts roll up
    * into the per-day PEAK hour — `window_time` re-times each hourly
    * cell so a second `window` groupBy can tier it into days, all
    * inside one streaming plan (no foreachBatch sink stage needed).
    * The peak election is deterministic: max on (n, earliest hour) —
    * ties take the EARLIEST hour via the negated-µs struct. State is
    * |hours| cells in tier 1 and |days| in tier 2 — calendar-bounded.
    * Returns (day_start_us, peak_hour_us, peak_n), exact integers. */
  def hourlyPeakPerDay(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
    hourly
      .groupBy(window(window_time(col("w")), "1 day").as("d"))
      .agg(max(col("n")).as("peak_n"),
        max_by(unix_micros(col("w.start")),
          struct(col("n"),
            (-unix_micros(col("w.start"))).as("neg"))).as("peak_hour_us"))
      .select(unix_micros(col("d.start")).as("day_start_us"),
        col("peak_hour_us"), col("peak_n"))
  }

  /** Watermarked streaming variant of [[hourlyPeakPerDay]] (append mode:
    * a day's peak emits once its day window passes the watermark). */
  def hourlyPeakPerDayStream(events: DataFrame,
                             lateness: String = "2 hours"): DataFrame =
    hourlyPeakPerDay(events.withWatermark("ts", lateness))
}
