package graft

import org.apache.spark.sql.SparkSession

/** Driver bench: one JSON line of per-query wall seconds at SPARK_GRAFT_SF_DIR.
  * Queries run in name order after a JVM/codegen warm-up action so the first
  * measured query doesn't absorb session startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + codegen + a first parquet read outside the timings;
    // the q36 fixture media table also renders here so the measured query
    // times decode, not payload synthesis
    // warmup failures are survivable (the measured run reports them as -1)
    // but must not pass silently — a broken fixture would otherwise surface
    // only as a mysteriously slow first query
    def warmup(name: String)(f: => Unit): Unit =
      try f catch {
        case t: Throwable => System.err.println(s"warmup '$name' failed: $t")
      }
    spark.range(1000).selectExpr("sum(id)").collect()
    warmup("entry")(SparkEntry.entry(spark).count())
    warmup("media fixture")(
      graft.pipeline.MediaFixtures.materializedMediaTable(spark, sfDir).count())

    // Host-contention calibration probe: a FIXED data-independent query
    // (pure compute over range(), no I/O) timed at start / middle / end of
    // the measured run. On an idle host the three times agree to within
    // JIT noise; under external contention they inflate together — so a
    // bench artifact whose probe values drift is self-diagnosing as a
    // contended measurement, not a code regression (the r04/r08 lesson:
    // 579 s contended vs 260 s clean on identical code, and nothing in
    // the JSON said so).
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 1L << 25, 1, cpus.toInt)
        .selectExpr("sum(id * 2654435761 % 1000003) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    warmup("probe jit")(probe()) // JIT/codegen the probe plan itself

    // The probe detects CPU contention but not memory/GC pressure (the r14
    // lesson: flat probes, 1.26x total under ambient load; reproducible
    // mid-run probe inflation at sf1 attributed to GC). Record the OS
    // 1-minute loadavg and the JVM's CUMULATIVE GC seconds at the same
    // start/mid/end marks so a ratio audit can separate the two causes:
    // loadavg up + gc flat = external contention; loadavg flat + gc delta
    // large = this JVM's own memory pressure.
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage // -1.0 where the platform hides it
    def gcSec(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum / 1e3
    }

    // optional comma-separated name-substring filter (local iteration and
    // the drift-isolation protocol; the driver passes no args and measures
    // the full registry)
    // empty segments drop: "" matches every name, so a stray comma would
    // silently turn a subset run into the full registry — invalidating
    // exactly the drift-isolation measurement the filter exists for.
    // An arg whose segments are ALL empty (a bare ",") is a malformed
    // filter, not a request for the full registry: fail fast rather than
    // silently inverting a subset run into a 360-query measurement.
    val only = args.headOption.map { a =>
      val segs = a.split(",").toSeq.filter(_.nonEmpty)
      if (segs.isEmpty)
        sys.error(s"bench filter '$a' has no non-empty segments; " +
          "pass no args to measure the full registry")
      segs
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }

    // a failing query reports -1 (and logs) instead of a normal-looking
    // wall time — a silently broken query must not read as a fast one.
    // After each query, drop checkpoint blocks IT created (iterative graph
    // operators localCheckpoint their edge relations): leaking 148 queries'
    // worth of dead blocks into the block manager skews later measurements.
    // Warmup-era blocks (fixture state) are kept.
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    val probeStart = probe()
    val (loadStart, gcStart) = (loadavg(), gcSec())
    var probeMid = -1.0
    var loadMid = -1.0
    var gcMid = -1.0
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i == selected.size / 2) {
        probeMid = probe(); loadMid = loadavg(); gcMid = gcSec()
      }
      val t0 = System.nanoTime()
      val sec = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"query '$name' failed: $t"); -1.0 }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = false))
      name -> sec
    }
    val probeEnd = probe()
    val (loadEnd, gcEnd) = (loadavg(), gcSec())
    if (probeMid < 0) { // subset runs smaller than 2
      probeMid = probeEnd; loadMid = loadEnd; gcMid = gcEnd
    }
    val probeJson = f"""{"start":$probeStart%.3f,"mid":$probeMid%.3f,"end":$probeEnd%.3f}"""
    val loadJson = f"""{"start":$loadStart%.2f,"mid":$loadMid%.2f,"end":$loadEnd%.2f}"""
    // cumulative JVM GC seconds at each mark; deltas isolate each third
    val gcJson = f"""{"start":$gcStart%.2f,"mid":$gcMid%.2f,"end":$gcEnd%.2f}"""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total sums SUCCESSFUL queries only; failures are visible as -1 entries
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFail = results.count(_._2 < 0)
    // The harness archives (and parses) only the LAST ~2000 stdout chars.
    // A 261-entry queries map is ~8 KB, so any line containing it can never
    // survive the tail intact (BENCH_r05/r06 both record parsed:null).
    // Contract-compliant fix: stdout carries exactly ONE self-contained JSON
    // line, kept well under the tail window (headline total + the slowest-40
    // per-query map). The full per-query map goes to stderr and to
    // bench_full_local.json in the cwd for human/judge inspection.
    val fullLine = s"""{"queries":$qs,"n_queries":${results.size},"n_fail":$nFail,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","probe_sec":$probeJson,"loadavg":$loadJson,"gc_cum_sec":$gcJson}"""
    System.err.println(fullLine)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full_local.json"),
        fullLine.getBytes("UTF-8"))
    } catch { case t: Throwable => System.err.println(s"bench_full_local.json write failed: $t") }
    val slow = results.sortBy(-_._2).take(40)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // keep this line comfortably inside the ~2000-char archived tail
    // (with sbt's trailing "[success] ..." line after it): short note,
    // slowest-40 map only; the full map is in bench_full_local.json.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_fail":$nFail,"probe_sec":$probeJson,"loadavg":$loadJson,"gc_cum_sec":$gcJson,"queries":$slow,"note":"queries=slowest-40; full map in bench_full_local.json; probe/loadavg/gc sampled at start-mid-end"}""")
    spark.stop()
  }
}
