package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity}

/** Manual scale stress (not a CI test): 20x-replicated corpus through the
  * LSH paths, verifying no quadratic blowup and stable wall time.
  * Run: Test/runMain graft.ScaleStress
  *
  * Writes scalestress_local.json (cwd): per-case wall seconds + overall
  * pass/fail, so the closed-form scale assertions are archived as a
  * machine-readable round artifact instead of run-manually-only claims. */
object ScaleStress {
  private val timings = scala.collection.mutable.LinkedHashMap[String, Double]()

  private def writeJson(ok: Boolean, err: Option[String]): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val cases = timings.map { case (k, v) =>
      "\"" + esc(k) + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val line = s"""{"all_passed":$ok,"n_cases":${timings.size},""" +
      s""""cases":$cases""" +
      err.map(e => s""","error":"${esc(e)}"""").getOrElse("") + "}"
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("scalestress_local.json"),
      line.getBytes("UTF-8"))
    catch { case t: Throwable =>
      System.err.println(s"scalestress_local.json write failed: $t") }
    println(line)
  }

  def main(args: Array[String]): Unit =
    try { run(); writeJson(ok = true, None) }
    catch { case t: Throwable => writeJson(ok = false, Some(t.toString)); throw t }

  private def run(): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      timings(name) = sec
      println(f"$name: $sec%.1f s"); r
    }
    // 100k docs: 20 shifted copies of the sf0.1 documents table
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
    val big = (0 until 20).map(i =>
      d0.select((col("doc_id") + lit(i * 100000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
    println(s"corpus: ${big.count()} docs")

    val mh = timed("minhash dedup 100k docs") {
      Dedup.minhashDedup(big, "doc_id", "text",
        Dedup.MinHashConfig(64, 16, 3, 0.8)).count()
    }
    println(s"  pairs found: $mh")

    // poisoned bucket: 5000 byte-identical docs collapse to ONE distinct
    // shingle set before banding — the LSH core never sees the cluster —
    // and expand afterward to their complete C(5000,2) = 12,497,500
    // true-duplicate pairs (output-bounded: they ARE all genuine pairs).
    val poison = spark.range(5000).select(
      (col("id") + 50000000L).as("doc_id"),
      lit("same boilerplate header appears on every page of the crawl").as("text"))
    val mp = timed("minhash dedup 100k docs + one poisoned 5000-doc cluster") {
      Dedup.minhashDedup(big.union(poison), "doc_id", "text",
        Dedup.MinHashConfig(64, 16, 3, 0.8)).count()
    }
    println(s"  pairs found: $mp (= base 1,052,400 + cluster C(5000,2) = 12,497,500, all true)")

    val sh = timed("simhash dedup 100k docs") {
      Dedup.simhashDedup(big, "doc_id", "text", maxHamming = 3).count()
    }
    println(s"  pairs found: $sh")

    val e0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val bigEmb = (0 until 20).map(i =>
      e0.select((col("vec_id") + lit(i * 100000L)).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    val ann = timed("LSH ANN over 40k vectors, 10 queries") {
      val queries = e0.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.annTopK(bigEmb, queries, 5, dim = 64).count()
    }
    println(s"  ann rows: $ann")

    // embedding near-dup at 20x duplication: the 40k rows collapse to 2k
    // distinct vectors before banding; every vector's 20 identical copies
    // expand to C(20,2) true pairs -> exactly 2000 x 190 = 380,000
    val en = timed("embedding near-dup over 40k vectors (20 copies each)") {
      Similarity.embeddingNearDupPairs(bigEmb, 0.999, dim = 64).count()
    }
    println(s"  pairs found: $en (expect 2000 x C(20,2) = 380,000)")

    // hot-domain cap: one domain holds 1M of 1.05M rows. The count-driven
    // cutoff must keep the rank window's input at ~oversample*k for the hot
    // group (not its full 1M rows), and the result must still be exactly
    // the k smallest draws.
    import graft.pipeline.Curation
    val hot = spark.range(1000000L).select(lit("hot").as("g"), col("id"))
      .union(spark.range(1000000L, 1050000L).select(
        (concat(lit("d"), pmod(col("id"), lit(500)))).as("g"), col("id")))
    val capped = timed("capPerGroup over 1.05M rows, one 1M-row domain") {
      Curation.capPerGroup(hot, "g", "id", "s1", k = 12).count()
    }
    println(s"  rows kept: $capped (expect 12 + 500*12 = 6012)")
    assert(capped == 6012L, s"expected 6012, got $capped")

    // hot-group top-k with ADVERSARIAL TIES: one 1M-row group whose score
    // has only 100 distinct values, so ~10k rows tie at every threshold —
    // the sample-quantile prune can only cut to the tie CLASS (~1% of the
    // group here, vs the ~4*oversample*k ideal for distinct scores), and
    // the row_number tiebreak (score DESC, id ASC) must stay exact at the
    // k-boundary.
    val tied = spark.range(1000000L)
      .select(lit("hot").as("g"), col("id"),
        pmod(col("id"), lit(100)).cast("double").as("score"))
      .union(spark.range(1000000L, 1050000L).select(
        concat(lit("d"), pmod(col("id"), lit(500))).as("g"), col("id"),
        pmod(col("id"), lit(97)).cast("double").as("score")))
    val topped = timed("topKPerGroup over 1.05M rows, one 1M-row tied group") {
      graft.pipeline.Curation.topKPerGroup(tied, "g", "score", "id", k = 12)
        .select("g", "id", "score").collect().map(r => (r.getString(0), r.getLong(1)))
    }
    // exactness vs the naive full window (fine locally; the point of the
    // prune is to never run this shape at scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val naive = tied.withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rnk") <= 12).select("g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(topped.toSet == naive.toSet,
      s"pruned top-k diverged from naive: ${topped.length} vs ${naive.length}")
    // survivor bound: replicate the deterministic md5-draw threshold and
    // count the hot group's prune survivors — the window's actual input
    val drawHex = org.apache.spark.sql.functions.substring(
      org.apache.spark.sql.functions.md5(concat(lit("tkpg:"), col("id").cast("string"))), 1, 8)
    val hotOnly = tied.filter(col("g") === "hot")
    val sample = hotOnly
      .filter(graft.pipeline.Curation.keepCondition(drawHex, lit(4096.0 / 1000000.0)))
      .select("score").collect().map(_.getDouble(0)).sortBy(-_)
    val idx = math.min(sample.length,
      math.max(1, math.ceil(4.0 * 8 * 12 * sample.length / 1000000.0).toInt))
    val thr = sample(idx - 1)
    val survivors = hotOnly.filter(col("score") >= thr).count()
    println(s"  top-k exact (${topped.length} rows); hot-group prune survivors: " +
      s"$survivors of 1,000,000 (threshold $thr — bounded by the tie class, " +
      "~10k rows/class here)")
    assert(survivors <= 30000L,
      s"prune survivors $survivors exceed the tie-class bound")

    // web-scale line dedup: 100k DISTINCT boilerplate lines (each in 3 docs,
    // maxDocs=2) force the anti-join strip path — the broadcast path's
    // single collected array would hold all 100k hashes and probe linearly
    val ldocs = spark.range(300000L).select(col("id").as("doc_id"),
      concat(lit("unique content line "), col("id"), lit(".\nboiler "),
        pmod(col("id"), lit(100000))).as("text"))
    val cleaned = timed("dedupLines over 300k docs, 100k boilerplate lines (anti-join path)") {
      graft.pipeline.Curation.dedupLines(ldocs, "doc_id", "text", maxDocs = 2)
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("n_removed").as("removed"))
        .collect().head
    }
    println(s"  docs: ${cleaned.getLong(0)}, lines removed: ${cleaned.getLong(1)} " +
      "(expect 300,000 docs, 300,000 removed)")
    assert(cleaned.getLong(0) == 300000L && cleaned.getLong(1) == 300000L)

    // passage dedup at stride 1: the explode factor is ~n_tokens, the
    // heaviest per-row cost in the curation tier — measure it on the 100k
    // corpus with a 60-token passage planted at varying offsets in every
    // 20th doc (5k carriers; each contributes 11 in-run windows)
    val pass60 = (1 to 60).map(i => f"ptok$i%02d").mkString(" ")
    val pdocs = big.select(col("doc_id"),
      concat(trim(col("text")),
        when(pmod(col("doc_id"), lit(20)) === 0, lit(" " + pass60))
          .otherwise(lit(" tailword unique end"))).as("text"))
    val dup = timed("duplicatePassages over 100k docs, stride 1 (window 50)") {
      Curation.duplicatePassages(pdocs, "doc_id", "text",
        window = 50, stride = 1, minDocs = 1000).count()
    }
    println(s"  rows: $dup (expect 5,000 carriers x 11 windows = 55,000 at minDocs=1000)")
    assert(dup == 55000L, s"expected 55000, got $dup")

    // hot-entity trailing window: 2M events, ONE user owns 1M of them —
    // the documented worst case (a RANGE frame walks one partition's sort
    // once; cost must stay linear, not quadratic in the hot user's rows).
    // Events land 10/second so every frame holds ~36k rows; the frame
    // boundary is monotone, so each row enters/leaves exactly once.
    val hotEv = spark.range(2000000L).select(
      when(col("id") < 1000000L, lit("hot")).otherwise(concat(lit("u"), pmod(col("id"), lit(50000)))).as("user_id"),
      col("id").as("event_id"),
      org.apache.spark.sql.functions.timestamp_seconds(
        lit(1700000000L) + (col("id") % 1000000L) / 10L).as("ts"),
      (col("id") % 100L).cast("double").as("value"))
    // fuzzy join at scale: 150k right names vs 5k typo'd lefts sharing the
    // literal "Entity#" prefix — the adversarial corpus for positional
    // segment blocking (every string carries the identical segment at the
    // identical position). The deletion-neighborhood regime must keep
    // candidates near-linear; a cartesian would be 750M levenshtein evals
    val names = spark.range(150000L).select(
      concat(lit("Entity#"), lpad(col("id").cast("string"), 9, "0")).as("name"))
    val typos = spark.range(5000L).select(
      concat(lit("Entity#"), lpad((col("id") * 30L).cast("string"), 9, "0")).as("n0"))
      .select(concat(substring(col("n0"), 1, 7), lit("Z"),
        substring(col("n0"), 9, 20)).as("name"))
    val fj = timed("fuzzyJoin 5k typos vs 150k names (k=2)") {
      graft.operators.Ops.fuzzyJoin(typos, names, "name", "name", maxDist = 2).count()
    }
    println(s"  pairs: $fj (each typo matches its original and same-length " +
      "1-digit-off neighbors within the substituted char's edit budget)")
    assert(fj >= 5000L, s"every planted typo must at least match its original: $fj")

    val trail = timed("trailingWindowAgg over 2M events, one 1M-row hot user") {
      graft.operators.Ops.trailingWindowAgg(hotEv, Seq("user_id"), "ts", "value", 3600L)
        .agg(org.apache.spark.sql.functions.max("n_trail").as("mx"),
          org.apache.spark.sql.functions.count(lit(1)).as("n")).collect().head
    }
    println(s"  rows: ${trail.getLong(1)}, max frame size: ${trail.getLong(0)} " +
      "(expect 2,000,000 rows; hot frames ~36,000 = 3600s x 10 events/s)")
    assert(trail.getLong(1) == 2000000L)
    assert(trail.getLong(0) >= 35000L && trail.getLong(0) <= 36100L,
      s"hot frame size ${trail.getLong(0)} outside the 3600s x 10/s envelope")

    // robust outliers on ONE 2M-row group: the documented hot-group case
    // for the order-statistic windows (two single-partition sorts). Values
    // are id%1000 (2000 of each residue) plus 100 planted outliers at EACH
    // tail, so med/mad/n_outliers have closed forms: med 499, mad 250,
    // outliers = the 200 planted (max natural dev 500 < 3*250).
    val rob = spark.range(2000000L)
      .select(lit("hot").as("g"), (col("id") % 1000L).cast("double").as("v"))
      .union(spark.range(100L).select(lit("hot").as("g"), lit(-10000.0).as("v")))
      .union(spark.range(100L).select(lit("hot").as("g"), lit(10000.0).as("v")))
    val robRow = timed("robustOutlierStats over one 2M-row group") {
      graft.pipeline.Stats.robustOutlierStats(rob, Seq("g"), "v", k = 3.0)
        .collect().head
    }
    assert(robRow.getAs[Double]("med") == 499.0 &&
      robRow.getAs[Double]("mad") == 250.0 &&
      robRow.getAs[Long]("n_outliers") == 200L,
      s"expected med 499 / mad 250 / 200 outliers, got $robRow")

    // funnel with ONE 1M-event hot user among 50k cold users: stage folds
    // are co-keyed min-joins — the hot user costs an aggregation, never a
    // per-user sort. Monotone drop-off and hot-user completion asserted.
    val fev = spark.range(2000000L).select(
      when(col("id") < 1000000L, lit(0L))
        .otherwise(col("id") % 50000L + 1L).as("user_id"),
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3L).cast("int") + 1).as("event_type"),
      org.apache.spark.sql.functions.timestamp_seconds(
        lit(1700000000L) + col("id")).as("ts"))
    val fn = timed("funnel over 2M events, one 1M-event hot user") {
      graft.pipeline.EventAnalytics.funnel(fev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
        .orderBy("stage_idx").select("n_users").collect().map(_.getLong(0)).toSeq
    }
    println(s"  stage counts: $fn (monotone; hot user completes all stages)")
    assert(fn.length == 3 && fn(0) >= fn(1) && fn(1) >= fn(2) && fn(2) >= 1L,
      s"funnel counts not a monotone non-empty drop-off: $fn")

    // batch sessionization with ONE 1M-event hot user: the per-user window
    // sorts the hot partition once (the trailingWindowAgg precedent); a
    // planted 90-min silence splits the hot user into exactly two 500k
    // sessions, and each cold user's events sit >30min apart, so every
    // cold event is its own session — closed-form session counts.
    val sev = spark.range(2000000L).select(
      when(col("id") < 1000000L, lit(0L))
        .otherwise(col("id") % 50000L + 1L).as("user_id"),
      col("id").as("event_id"),
      org.apache.spark.sql.functions.timestamp_seconds(
        lit(1700000000L) + col("id") +
          when(col("id") < 1000000L && col("id") >= 500000L, lit(5400L))
            .otherwise(lit(0L))).as("ts"))
    val sess = timed("sessionStats over 2M events, one 1M-event hot user") {
      graft.pipeline.EventAnalytics.sessionStats(sev, "user_id", "event_id",
          "ts", gapMinutes = 30)
        .agg(count(lit(1)).as("n_sessions"),
          max("n_events").as("max_n")).collect().head
    }
    println(s"  sessions: ${sess.getLong(0)}, largest: ${sess.getLong(1)} " +
      "(expect 1,000,002 sessions; hot sessions 500k each)")
    assert(sess.getLong(0) == 1000002L && sess.getLong(1) == 500000L,
      s"session closed form broken: $sess")

    // OLS over one 2M-row group on a planted exact line y = 2x + 1
    // (x = id % 1000, inside linearFit's 9e9 moment-magnitude contract):
    // one conditional-moment aggregate pass, no window, decimal-exact.
    val lin = spark.range(2000000L).select(
      (col("id") % 1000L).cast("double").as("x"))
      .select(col("x"), (col("x") * 2.0 + 1.0).as("y"))
    val fit = timed("linearFit over 2M rows, planted exact line") {
      graft.pipeline.Stats.linearFit(lin, Seq.empty, col("x"), col("y"))
        .collect().head
    }
    assert(fit.getAs[Double]("slope") == 2.0 &&
      fit.getAs[Double]("intercept") == 1.0 &&
      fit.getAs[Double]("r2") == 1.0, s"planted line not recovered: $fit")

    // PMI over the 100k-doc replicated corpus: state is vocab-bounded
    // (31 distinct tokens here -> <= 961 bigram types) no matter the
    // corpus size; the scan dominates, the joins carry counts only.
    val pmiN = timed("pmiBigrams over 100k docs") {
      graft.pipeline.TextAnalysis.pmiBigrams(big, "text", minCount = 5L).count()
    }
    println(s"  bigram types: $pmiN (vocab-bounded, <= 31^2)")
    assert(pmiN <= 961L, s"bigram state exceeded the vocab bound: $pmiN")

    // triangle counting with ONE 100k-degree hub: a star center plus a
    // ring over the leaves. Id-oriented wedge enumeration would explode at
    // the center (C(100k,2) ≈ 5e9 wedges); degree orientation points every
    // star edge INTO the hub, so wedges enumerate at the degree-3 leaves
    // (≤3 per leaf, ~300k total). Closed form: one triangle per ring edge.
    val leaves = 100000L
    val star = spark.range(leaves).select(lit(0L).as("src"), (col("id") + 1L).as("dst"))
    val ring = spark.range(leaves).select((col("id") + 1L).as("src"),
      (((col("id") + 1L) % leaves) + 1L).as("dst"))
    val triRow = timed("triangleCounts over a 100k-degree hub + leaf ring") {
      graft.pipeline.Graph.triangleCounts(star.union(ring), "src", "dst")
        .agg(org.apache.spark.sql.functions.sum("n_tri").as("s"),
          max("n_tri").as("mx"), count(lit(1)).as("n")).collect().head
    }
    println(s"  corner-sum: ${triRow.getAs[Long]("s")}, hub: ${triRow.getAs[Long]("mx")}, " +
      s"nodes in triangles: ${triRow.getAs[Long]("n")} (expect 300k / 100k / 100,001)")
    assert(triRow.getAs[Long]("s") == 3 * leaves &&
      triRow.getAs[Long]("mx") == leaves &&
      triRow.getAs[Long]("n") == leaves + 1,
      s"hub-star closed form broken: $triRow")

    // radius join over a 450x450 lattice with 4-unit spacing (202,500
    // points): at radius 5 only the 4 axis neighbors qualify (diagonals sit
    // at 4sqrt(2) > 5), so the exact pair count is the closed-form
    // 2*450*449 = 404,100. The grid explode is a bounded 9x of the id
    // triple; a BETWEEN nested loop here would be 2e10 comparisons.
    val side = 450L
    val lattice = spark.range(side * side).select(col("id"),
      (col("id") % side * 4L).as("x"), expr(s"id div $side * 4").as("y"))
    val rj = timed("radiusSelfJoin over a 202k-point lattice") {
      graft.pipeline.Spatial.radiusSelfJoin(lattice, "id", "x", "y", radius = 5)
        .count()
    }
    println(s"  pairs: $rj (closed form 2*450*449 = 404,100)")
    assert(rj == 2 * side * (side - 1), s"lattice closed form broken: $rj")

    // k-core peel over the hub-star + ring graph plus a planted 10-clique:
    // every star/ring edge touches a degree-3 leaf, so ONE k=4 round
    // erases the entire 200k-edge graph and only the clique (degree 9)
    // survives — the peel must be driven by degrees, never node ids.
    val clique = (for (i <- 1 to 10; j <- (i + 1) to 10)
      yield (1000000L + i, 1000000L + j)).toSeq
    import spark.implicits._
    val kc = timed("kCore over hub-star+ring + planted 10-clique") {
      graft.pipeline.Graph.kCore(
        star.union(ring).union(clique.toDF("src", "dst")),
        "src", "dst", k = 4, rounds = 2)
        .agg(count(lit(1)).as("n"), min("deg").as("mn"), max("deg").as("mx"))
        .collect().head
    }
    println(s"  core: ${kc.getLong(0)} nodes, deg [${kc.getLong(1)}, ${kc.getLong(2)}] " +
      "(expect 10 / 9 / 9)")
    assert(kc.getLong(0) == 10L && kc.getLong(1) == 9L && kc.getLong(2) == 9L,
      s"clique core broken: $kc")

    // BFS over a 1M-node chain from the midpoint, 5 hops: the frontier
    // stays ~2 nodes per round against the 1M-edge relation — visited is
    // exactly the 11-node ball. Frontier joins must stay hash joins.
    val chain = spark.range(999999L).select(col("id").as("src"),
      (col("id") + 1L).as("dst"))
    val bf = timed("bfsHops over a 1M-node chain, 5 hops from the midpoint") {
      graft.pipeline.Graph.bfsHops(chain, "src", "dst",
        spark.range(500000L, 500001L).select(col("id").as("node")),
        "node", maxHops = 5).count()
    }
    println(s"  ball size: $bf (expect 11)")
    assert(bf == 11L, s"chain BFS ball broken: $bf")

    // weighted SSSP over the same 1M-node chain (weight 2 per edge), 5
    // relaxation rounds from the midpoint: the reached set is the 11-node
    // ball with dist = 2·hops — per-round cost is one |dist|-row hash join
    // against the 2M-row adjacency, never a frontier explosion.
    val sg = timed("ssspDistances over the 1M-node chain, 5 rounds") {
      graft.pipeline.Graph.ssspDistances(
        chain.select(col("src"), col("dst"), lit(2L).as("w")), "src", "dst", "w",
        spark.range(500000L, 500001L).select(col("id").as("node")),
        "node", rounds = 5)
        .agg(count(lit(1)).as("n"), max("dist").as("mx"),
          sum("dist").as("s")).collect().head
    }
    // Σ dist over the ball = 2 · 2 · (1+2+3+4+5) = 60
    println(s"  ball: ${sg.getLong(0)} nodes, max dist ${sg.getLong(1)}, " +
      s"sum ${sg.getLong(2)} (expect 11 / 10 / 60)")
    assert(sg.getLong(0) == 11L && sg.getLong(1) == 10L && sg.getLong(2) == 60L,
      s"chain SSSP closed form broken: $sg")

    // clamped running level: ONE 1M-move key alternating +1/−2 — the level
    // clamps at zero every second move (the adversarial all-clamp case);
    // closed form: peak 1, final 0. The closed-form identity does this in
    // one window sort where the literal recurrence would be sequential.
    val moves = spark.range(1000000L).select(lit("k").as("key"),
      col("id").as("ord"),
      when(col("id") % 2 === 0, 1L).otherwise(-2L).as("d"))
    val cl = timed("clampedRunningLevel over one 1M-move key") {
      graft.pipeline.Stats.clampedRunningLevel(moves, "key", col("d"),
        Seq(col("ord"))).collect().head
    }
    println(s"  final ${cl.getAs[Long]("final_level")}, peak ${cl.getAs[Long]("peak_level")} " +
      "(expect 0 / 1)")
    assert(cl.getAs[Long]("final_level") == 0L && cl.getAs[Long]("peak_level") == 1L,
      s"clamp closed form broken: $cl")

    // item-kNN with a 100k-user hot item: every user holds hot item "H"
    // plus one of 5 cold items — the pair relation is exactly the 5 (H, A_j)
    // edges (cold items never co-occur), so the hot item cannot quadratically
    // expand; the probe user owning only H gets the tie-broken A0..A2.
    val baskets = spark.range(1L, 100001L).select(col("id").as("u"), lit("H").as("i"))
      .union(spark.range(1L, 100001L).select(col("id").as("u"),
        concat(lit("A"), (col("id") % 5).cast("string")).as("i")))
      .union(Seq((0L, "H")).toDF("u", "i"))
    val rec = timed("recommendTopK with a 100k-user hot item") {
      graft.pipeline.EventAnalytics.recommendTopK(baskets, "u", "i", k = 3)
        .filter(col("user") === 0L).orderBy("rank")
        .select("item").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSeq
    }
    println(s"  probe user top-3: $rec (expect A0, A1, A2 — equal scores, item tiebreak)")
    assert(rec == Seq("A0", "A1", "A2"), s"hot-item recommender broken: $rec")

    // item-kNN with ONE 100k-item power basket: uncapped, user 0's basket
    // alone would emit C(1e5, 2) = 5e9 pairs through a single join key —
    // the maxBasket=1024 deterministic cap bounds it to ≤ 1024²/2 ≈ 524k,
    // so the whole run finishes in seconds. Users 1..2000 hold {P0, P1},
    // giving one real pair the probe user (owning only P0) is recommended
    // from; the power items appear in exactly one basket, so the cap
    // removes no true pair.
    val power = spark.range(0L, 100000L)
      .select(lit(0L).as("u"), concat(lit("Z"), col("id").cast("string")).as("i"))
    val pairsB = spark.range(1L, 2001L)
      .select(col("id").as("u"), lit("P0").as("i"))
      .union(spark.range(1L, 2001L).select(col("id").as("u"), lit("P1").as("i")))
      .union(Seq((999999L, "P0")).toDF("u", "i"))
    val powerTop = timed("recommendTopK with one 100k-item power basket (capped)") {
      graft.pipeline.EventAnalytics.recommendTopK(
          power.union(pairsB), "u", "i", k = 3)
        .filter(col("user") === 999999L).orderBy("rank")
        .select("item").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSeq
    }
    println(s"  probe user top-3: $powerTop (expect P1 via the (P0,P1) pair)")
    assert(powerTop == Seq("P1"), s"power-basket recommender broken: $powerTop")

    // GROWTH LAW for the basket pair stage (round 15; q185's sf1 watch
    // item — 5.3× at 10× data): the circulant design — M users, user u
    // holds items {(u+j) mod M, j < B} — has exact closed forms: every
    // item sits in B baskets; the item pair at circular distance d
    // co-occurs in B−d baskets, so at minUsers=2 the similarity matrix
    // is EXACTLY M·(B−2) rows and the pre-agg pair mass is M·C(B,2) —
    // QUADRATIC in basket density B (until the maxBasket cap clamps it,
    // the power-basket case above), LINEAR in users at fixed density.
    // Running B=32 vs B=64 at the same M isolates the density term the
    // sf1 bench conflates with corpus growth: 2× density ⇒ 4.06× pair
    // mass by closed form (the asserted counts below ARE the law). The
    // recorded walls show the 40M-row pair stage still costs ~seconds on
    // local[32] — at this size it is scan/JIT-dominated, so wall ratios
    // here bound the constant factor, not the exponent.
    val mCirc = 20000L
    def circulant(bsz: Int) = spark.range(mCirc).select(col("id").as("u"),
        explode(sequence(lit(0), lit(bsz - 1))).as("j"))
      .select(col("u"), pmod(col("u") + col("j"), lit(mCirc)).as("i"))
    val cc32 = timed("cooccurrenceCosine circulant 20k users B=32 (9.9M pair rows)") {
      graft.pipeline.EventAnalytics.cooccurrenceCosine(
        circulant(32), "u", "i", minUsers = 2L).count()
    }
    assert(cc32 == mCirc * 30, s"circulant closed form B=32: $cc32")
    val cc64 = timed("cooccurrenceCosine circulant 20k users B=64 (2x density, 40.3M pair rows)") {
      graft.pipeline.EventAnalytics.cooccurrenceCosine(
        circulant(64), "u", "i", minUsers = 2L).count()
    }
    assert(cc64 == mCirc * 62, s"circulant closed form B=64: $cc64")
    // the full recommender on the B=32 circulant: user 0 owns {0..31};
    // candidate 32 receives sim (32−d)/32 from owned 22..31 (d = 1..10 —
    // exactly the maxNeighbors=20 two-sided window) → score
    // Σ_{d=1..10}(32−d)/32 = 265/32 = 8.28125 EXACTLY (every /32 cosine
    // is ≤5-decimal, so the 6dp round is lossless and the decimal sum
    // exact); the left-edge mirror candidate 19999 ties and loses the
    // item-asc tiebreak.
    val rec32 = timed("recommendTopK circulant 20k users B=32") {
      graft.pipeline.EventAnalytics.recommendTopK(
          circulant(32), "u", "i", k = 1)
        .filter(col("user") === 0L)
        .select("item", "score").collect().head
    }
    assert(rec32.getLong(0) == 32L && rec32.getDouble(1) == 8.28125,
      s"circulant recommender probe: $rec32")

    // Fellegi–Sunter weights over 10M labeled pairs, 3 fields: every count
    // rides ONE map-side-combinable aggregate — wall time is scan-bound,
    // state is a single stats row. Deterministic fixture: pair i is a
    // match when i % 10 = 0; field agreements are modular, so every count
    // (and the smoothed m/u) has a closed form to assert against.
    val fsPairs = spark.range(10000000L).select(
      (pmod(col("id"), lit(10)) === 0).as("lbl"),
      (pmod(col("id"), lit(2)) === 0).as("f1"),
      (pmod(col("id"), lit(5)) === 0).as("f2"),
      (pmod(col("id"), lit(3)) === 0).as("f3"))
    val fs = timed("fellegiSunterWeights over 10M labeled pairs, 3 fields") {
      graft.pipeline.Linkage.fellegiSunterWeights(fsPairs, col("lbl"),
          Seq("f1" -> col("f1"), "f2" -> col("f2"), "f3" -> col("f3")))
        .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4)))
        .toMap
    }
    // matches (i%10=0): all even -> f1 agrees on all 1M; f2 = i%5=0 yes;
    // non-matches agreeing f1: evens not %10 -> 4M
    println(s"  agree counts: $fs")
    assert(fs("f1") == ((1000000L, 4000000L)), s"f1 counts off: $fs")
    assert(fs("f2") == ((1000000L, 1000000L)), s"f2 counts off: $fs")

    // PQ encode over 40k 64-dim vectors (20 shifted copies of the sf0.1
    // embeddings): a stateless projection must stream — 160k code rows, no
    // shuffle, wall time scan-bound.
    val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    val bigVecs = (0 until 20).map(i =>
      embBase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    val pq = timed("pqEncode over 40k vectors") {
      Similarity.pqEncode(bigVecs, nSub = 4, subDim = 16, k = 8).count()
    }
    println(s"  code rows: $pq (expect 4x corpus)")
    assert(pq == 4L * bigVecs.count(), s"pq row count broken: $pq")

    // daily snapshot ffill: 30k keys, one observation each at day id%30,
    // spine to the global max day 29 — output is the closed-form
    // 1000 · Σ_{r=0..29}(30−r) = 465,000 rows, every fill a carried value.
    val obs = spark.range(30000L).select(col("id").as("u"), col("id").as("eid"),
      to_timestamp(from_unixtime(col("id") % 30 * 86400L)).as("ts"),
      col("id").cast("double").as("v"))
    val ff = timed("dailySnapshotFfill over 30k keys") {
      graft.pipeline.EventAnalytics.dailySnapshotFfill(obs, "u", "eid", "ts", "v")
        .agg(count(lit(1)).as("n"), countDistinct(col("value")).as("nv"))
        .collect().head
    }
    println(s"  rows: ${ff.getLong(0)}, distinct values ${ff.getLong(1)} " +
      "(expect 465,000 / 30,000)")
    assert(ff.getLong(0) == 465000L && ff.getLong(1) == 30000L,
      s"ffill closed form broken: $ff")

    // prefix-filter set-sim join, adversarial hot token: every doc shares
    // the token "common" (frequency = corpus size), but it NEVER enters a
    // prefix — the frequency-ascending order pushes it last, so the
    // candidate join only sees the rare id-specific tokens. 50k docs in
    // 500 near-dup families (100 members sharing common + 9 family tokens
    // of their 11, J = 10/12 >= 3/4): pairs = 500 * C(100,2), wall time
    // by family-token buckets (~100 docs), never by the hot token's 50k.
    val fams = spark.range(50000L).select(col("id"),
      (col("id") % 500L).as("fam"), (col("id") / 500L).cast("long").as("m"))
    val famDocs = fams.select(col("id").as("doc_id"), concat_ws(" ",
      lit("common"),
      concat(lit("f"), col("fam"), lit("a")), concat(lit("f"), col("fam"), lit("b")),
      concat(lit("f"), col("fam"), lit("c")), concat(lit("f"), col("fam"), lit("d")),
      concat(lit("f"), col("fam"), lit("e")), concat(lit("f"), col("fam"), lit("g")),
      concat(lit("f"), col("fam"), lit("h")), concat(lit("f"), col("fam"), lit("i")),
      concat(lit("f"), col("fam"), lit("j")),
      concat(lit("u"), col("id"))).as("text"))
    val ssj = timed("setSimJoinPrefix over 50k docs, one corpus-wide hot token") {
      Dedup.setSimJoinPrefix(famDocs, "doc_id",
        split(col("text"), " "), tauNum = 3, tauDen = 4).count()
    }
    println(s"  pairs: $ssj (expect 500 x C(100,2) = 2,475,000)")
    assert(ssj == 2475000L, s"prefix join broken: $ssj")

    // SemDeDup over 40k vectors (20 exact copies of each sf0.1 embedding,
    // ids shifted): every copy must drop — survivors = one per distinct
    // vector regardless of which k-means cell the family lands in
    // (identical vectors share a cell by construction).
    val sem = timed("semanticDedup over 40k vectors (20 copies each)") {
      Similarity.semanticDedup(bigVecs,
        Similarity.pseudoCentroids(16, 64), threshold = 0.999999).count()
    }
    println(s"  kept: $sem (expect 2,000 distinct-vector survivors)")
    assert(sem == 2000L, s"semanticDedup broken: $sem")

    // hashed-classifier scoring over 100k docs: a zero-exchange projection
    // must stream scan-bound; count forces full evaluation.
    val clf = timed("classifier scoring over 100k docs") {
      graft.pipeline.Classifier.scoreDocuments(big, "text", nClasses = 4)
        .agg(sum(col("pred_class"))).collect().head.getLong(0)
    }
    println(s"  pred_class checksum: $clf")

    // ROC AUC over 2M rows in ONE group with a perfectly separable planted
    // signal: scores collapse to 1000 distinct values before the window,
    // so the single-group window sees 1000 rows, not 2M; AUC must be
    // exactly 1.0 (positives occupy the top half of the score range).
    val aucRows = spark.range(2000000L).select(
      (col("id") % 1000L).cast("double").as("score"),
      (col("id") % 1000L >= 500L).as("label"), lit("all").as("g"))
    val auc = timed("rocAuc over 2M rows, one group, 1000 distinct scores") {
      graft.pipeline.Stats.rocAuc(aucRows, "score", col("label"), Seq("g"))
        .collect().head.getDouble(3)
    }
    println(s"  auc: $auc (expect 1.0 - perfect separation)")
    assert(auc == 1.0, s"auc broken: $auc")

    // PCA power iteration over the 40k-vector corpus (4 rounds): the
    // checkpointed-v lineage keeps work linear in rounds; the dominant
    // direction of a 20x-replicated corpus must align with the base
    // corpus's (Gram scales by 20 - same eigenvector).
    val pcaBase = graft.pipeline.Similarity.topPrincipalComponent(
      e0, "vec_id", "embedding", iters = 4)
      .orderBy("dim").select("loading").collect().map(_.getDouble(0))
    val pcaBig = timed("PCA power iteration over 40k vectors, 4 rounds") {
      graft.pipeline.Similarity.topPrincipalComponent(
        bigEmb, "vec_id", "embedding", iters = 4)
        .orderBy("dim").select("loading").collect().map(_.getDouble(0))
    }
    val align = math.abs(pcaBase.zip(pcaBig).map { case (a, b) => a * b }.sum)
    println(f"  |cos(base, 20x)| = $align%.9f (expect ~1)")
    assert(align > 0.999999, s"replication skewed the principal axis: $align")

    // KMV distinct over 10M rows / 1M distinct keys at k=256: the prune
    // must bound the per-group sort at ~1k survivors, and the estimate
    // (deterministic - a fixed property of the md5 draw) must land within
    // 10% of the truth.
    val kmvRows = spark.range(10000000L)
      .select(lit("g").as("g"), (col("id") % 1000000L).as("k"))
    val kmvEst = timed("kmvDistinct over 10M rows, 1M distinct, k=256") {
      graft.pipeline.Stats.kmvDistinct(kmvRows, col("k"), Seq("g"), k = 256)
        .collect().head.getDouble(2)
    }
    println(f"  est: $kmvEst%.1f (truth 1,000,000)")
    assert(math.abs(kmvEst - 1000000.0) / 1000000.0 < 0.10,
      s"KMV estimate off: $kmvEst")

    // Count-Min over the same 10M rows with one planted mega-key: the
    // grid stays 4x256 cells; the hot key's estimate >= its exact count.
    val cmsRows = kmvRows.select(
      when(col("k") < 500000L, lit("HOT")).otherwise(col("k").cast("string"))
        .as("k"))
    val cms = timed("cmsFrequency over 10M rows + 5M-row hot key") {
      graft.pipeline.Stats.cmsFrequency(cmsRows, col("k"), depth = 4)
        .filter(col("key") === "HOT").collect().head.getLong(1)
    }
    println(s"  HOT est: $cms (exact 5,000,000)")
    assert(cms >= 5000000L, s"CMS undercounted the hot key: $cms")

    // KMV set ops over 10M rows: A = 1M distinct, B = 1M distinct shifted
    // by 500k -> union 1.5M, Jaccard 1/3. One hash-keyed aggregate + a
    // k-row TakeOrdered; estimates must track truth.
    val setA = spark.range(10000000L).select((col("id") % 1000000L).as("k"))
    val setB = spark.range(10000000L)
      .select((col("id") % 1000000L + 500000L).as("k"))
    val so = timed("kmvSetOps over 2x10M rows, 1.5M-union, k=256") {
      graft.pipeline.Stats.kmvSetOps(setA, col("k"), setB, col("k"), k = 256)
        .collect().head
    }
    println(f"  union_est: ${so.getDouble(3)}%.0f (truth 1,500,000), " +
      f"jaccard_est: ${so.getDouble(4)}%.4f (truth 0.3333)")
    assert(math.abs(so.getDouble(3) - 1500000.0) / 1500000.0 < 0.10)
    assert(math.abs(so.getDouble(4) - 1.0 / 3) < 0.10)

    // skyline over 1M rows with a BOUNDED x domain (10k distinct): the
    // sweep window sees 10k rows, never 1M; planted frontier of one row
    // per x-group maximum, global frontier = the documented sweep result.
    val skyRows = spark.range(1000000L).select(
      (col("id") % 10000L).as("x"), (col("id") % 997L).as("y"),
      col("id").as("rid"))
    val sky = timed("skyline over 1M rows, 10k-value x domain") {
      graft.operators.Ops.skyline(skyRows, "x", "y").count()
    }
    println(s"  frontier rows: $sky (output-bounded, never O(n^2) pairs)")
    assert(sky > 0 && sky < 20000, s"skyline blew up: $sky")

    // Poisson bootstrap over 2M rows x 100 replicates = 200M weighted
    // rows, all collapsed map-side: se must land near sd/sqrt(n) =
    // 28.866/1414 ~ 0.0204.
    val bootRows = spark.range(2000000L)
      .select(col("id"), (col("id") % 100L).cast("double").as("v"))
    val boot = timed("poissonBootstrapMean over 2M rows x 100 reps") {
      graft.pipeline.Stats.poissonBootstrapMean(bootRows, col("id"),
        col("v"), reps = 100).collect().head
    }
    println(f"  mean: ${boot.getDouble(1)}%.4f (truth 49.5), " +
      f"boot_se: ${boot.getDouble(3)}%.5f (analytic ~0.0204)")
    assert(math.abs(boot.getDouble(1) - 49.5) < 0.2)
    assert(boot.getDouble(3) > 0.005 && boot.getDouble(3) < 0.05,
      s"bootstrap se implausible: ${boot.getDouble(3)}")

    // Spearman over 5M rows with 1000-value domains and a perfectly
    // monotone relation: rank relations are domain-bounded (1000 rows)
    // and tie-averaged ranks must still give exactly rho = 1.
    val spRows = spark.range(5000000L).select(
      (col("id") % 1000L).cast("double").as("a"),
      ((col("id") % 1000L) * 3 + 1).cast("double").as("b"))
    val sp = timed("spearman over 5M rows, 1000-value domains") {
      graft.pipeline.Stats.spearman(spRows, col("a"), col("b"))
        .collect().head.getDouble(1)
    }
    println(s"  rho: $sp (expect exactly 1.0 - monotone with uniform ties)")
    assert(sp == 1.0, s"spearman broken at scale: $sp")

    // trimmedStats on ONE 2M-row hot group with adversarial ties exactly
    // at the 10% cut (values 0..9, 200k copies each): k = 200k lands the
    // cut INSIDE the tied runs — trimmed mean must equal the plain mean
    // of the middle multiset regardless of tie order: ranks 200001..1.8M
    // hold 200k '1's minus... values 1..8 fully plus zero 0s/9s -> 4.5.
    val hotG = spark.range(2000000L).select(lit("g").as("g"),
      (col("id") % 10L).as("v"))
    val tr = timed("trimmedStats over one 2M-row group, ties at the cut") {
      graft.pipeline.Stats.trimmedStats(hotG, Seq("g"), col("v"))
        .collect().head
    }
    println(f"  mean ${tr.getDouble(2)}%.3f trimmed ${tr.getDouble(3)}%.3f " +
      f"winsor ${tr.getDouble(4)}%.3f cuts [${tr.getLong(5)}, ${tr.getLong(6)}]")
    assert(tr.getDouble(2) == 4.5 && tr.getDouble(3) == 4.5)
    assert(tr.getLong(5) == 1L && tr.getLong(6) == 8L) // cut order stats
    assert(tr.getDouble(4) == (1600000L * 4.5 + 200000L * 1 + 200000L * 8) /
      2000000.0)

    // HITS on a 1M-edge star-heavy bipartite graph: hub customer 0 buys
    // every part; 999k spoke customers buy one part each (part = id%1000
    // -> 1000 parts, ~1000 spokes per part). Analytic 2-round counts:
    // a1(p) = 1000 spokes + hub = 1001; h1(hub) = sum a1 = 1001*1000,
    // h1(spoke) = 1001; a2(p) = h1(hub) + 1000*h1(spoke) = 2002*1000 + ...
    val spokes = spark.range(999999L).select((col("id") + 1).as("c"),
      (col("id") % 1000L).as("p"))
    val hub = spark.range(1000L).select(lit(0L).as("c"), col("id").as("p"))
    val hitsTop = timed("hits over 1M-edge star bipartite graph") {
      graft.pipeline.Graph.hits(spokes.union(hub), "c", "p", iters = 2)
        .filter(col("side") === "hub")
        .orderBy(col("score_raw").desc).limit(1).collect().head
    }
    println(s"  top hub: node ${hitsTop.getLong(1)} raw ${hitsTop.getLong(2)}")
    assert(hitsTop.getLong(1) == 0L, "the star hub must dominate")
    assert(hitsTop.getDouble(3) == 1.0)

    // whaleShare over 1M users: the ranking window sorts the ROLLUP (1M
    // rows), never the 10M-event relation; top-1% share of the linear
    // value ramp v(u) = u is analytically 1 - 0.99^2 ~ 1.99%... compute:
    // sum top 10k of 1..1M = (1M + 990001)/2*10k; total = 1M*(1M+1)/2.
    val evRows = spark.range(10000000L).select((col("id") % 1000000L + 1).as("u"),
      ((col("id") % 1000000L + 1) / 100.0).as("v")) // 10 copies of u -> cents exact
    val ws = timed("whaleShare over 10M rows, 1M users") {
      graft.pipeline.Stats.whaleShare(evRows, "u", col("v"), Seq(1))
        .collect().head
    }
    val topSum = BigInt(1000000L + 990001L) * 10000 / 2 * 10
    val totSum = BigInt(1000000L) * 1000001L / 2 * 10
    val expShare = math.round(topSum.toDouble / totSum.toDouble * 1e6) / 1e6
    println(f"  top-1%% share: ${ws.getDouble(3)}%.6f (analytic $expShare%.6f)")
    assert(ws.getLong(1) == 10000L)
    assert(math.abs(ws.getDouble(3) - expShare) < 1e-6,
      s"whale share mismatch: ${ws.getDouble(3)} vs $expShare")

    // weightedQuantiles over 10M rows / 4 groups / 10k-value domain: the
    // window runs on the (group, value) ROLLUP (40k rows), never the 10M
    // facts. Uniform construction -> analytic medians: per group each of
    // the 10k values carries 250 unit-weight rows (W = 2.5M); the 1/2
    // crossing is cum >= 1.25M i.e. value 4999; the 9/10 crossing 8999.
    val wqRows = spark.range(10000000L).select(
      (col("id") % 4L).as("g"), expr("(id div 4) % 10000").as("v"),
      lit(1L).as("w"))
    val wq = timed("weightedQuantiles over 10M rows, 10k-value domain") {
      graft.operators.Ops.weightedQuantiles(wqRows, Seq("g"), "v", col("w"),
        qs = Seq(1 -> 2, 9 -> 10)).collect()
    }
    assert(wq.length == 8)
    wq.foreach { r =>
      val exp = if (r.getInt(1) == 1) 4999L else 8999L
      assert(r.getLong(3) == exp, s"weighted quantile off: $r")
      assert(r.getLong(4) == 2500000L)
    }

    // saltedJoin with ONE pathological key: 5M of 10M probe rows share
    // key 0 — the exact case a plain shuffle join turns into a straggler.
    // Count must equal the plain join's analytic value (no row invented
    // or lost by the salt re-route).
    val probe = spark.range(10000000L).select(
      when(col("id") < 5000000L, 0L).otherwise(col("id") % 1000L).as("k"),
      col("id").as("pid"))
    val build = spark.range(1000L).select(col("id").as("k"),
      (col("id") * 7L).as("bv"))
    val sj = timed("saltedJoin 10M probe rows, one 5M-row hot key") {
      graft.operators.Ops.saltedJoin(probe, build, Seq("k"),
        xxhash64(col("pid")), saltBuckets = 32).count()
    }
    assert(sj == 10000000L, s"salted join row count off: $sj")

    // mannWhitney over 20M rows / 50 distinct values: the per-group
    // window runs on the 50-row value rollup, never the facts; the two
    // samples are constructed distribution-identical, so U1 must equal
    // n1·n2/2 EXACTLY and z must be exactly 0.
    // sample membership from (id div 50) so it's INDEPENDENT of v —
    // id % 2 would segregate the samples by value parity
    val mwRows = spark.range(20000000L).select(lit("g").as("grp"),
      (col("id") % 50L).as("v"), expr("(id div 50) % 2 = 0").as("s"))
    val mw = timed("mannWhitney over 20M rows, 50-value domain") {
      graft.pipeline.Stats.mannWhitney(mwRows, "v", col("s"), Seq("grp"))
        .collect().head
    }
    assert(mw.getLong(1) == 10000000L && mw.getLong(2) == 10000000L)
    assert(mw.getDouble(3) == 5.0e13, s"U1 off: ${mw.getDouble(3)}")
    assert(mw.getDouble(4) == 0.0, s"z off: ${mw.getDouble(4)}")

    // tCloseness over 10M rows / 4 groups / 10-value vocabulary: the
    // zero-filled spine is 40 rows; identically-distributed groups must
    // land at EMD exactly 0.
    val tcRows = spark.range(10000000L).select((col("id") % 4L).as("g"),
      expr("(id div 4) % 10").as("v"))
    val tc = timed("tCloseness over 10M rows, 10-value vocabulary") {
      graft.pipeline.Stats.tCloseness(tcRows, Seq("g"), col("v")).collect()
    }
    assert(tc.length == 4 && tc.forall(_.getDouble(2) == 0.0))

    // logRank over 10M subjects / 1000 distinct durations: the entire
    // cost is ONE duration-grain rollup (the windows run on 1000 rows).
    // Groups are identical by construction — (id div 1000) parity gives
    // na = nb = 5000 at every duration, na/nt = 0.5 is IEEE-exact, so
    // E_A = O_A = 5,000,000 EXACTLY and chi2 is exactly 0.
    val lrRows = spark.range(10000000L).select((col("id") % 1000L).as("t"),
      lit(true).as("ev"), (expr("(id div 1000) % 2") === 0L).as("a"))
    val lr = timed("logRank over 10M subjects, 1000 durations") {
      graft.pipeline.EventAnalytics.logRank(lrRows, col("t"), col("ev"),
        col("a")).collect().head
    }
    assert(lr.getLong(2) == 5000000L && lr.getDouble(3) == 5000000.0,
      s"O_A/E_A must be exactly 5M on identical groups: $lr")
    assert(lr.getDouble(6) == 0.0, s"chi2 off: $lr")

    // kruskalWallis over 20M rows / 50 distinct values: ranks live on the
    // 50-row value rollup (never the facts). Groups are value-identical
    // by construction ((id div 50) parity), so every group mean rank is
    // exactly (N+1)/2 and H is EXACTLY 0 before and after tie correction.
    val kwRows = spark.range(20000000L).select(
      expr("(id div 50) % 2 = 0").as("g"),
      (col("id") % 50L).cast("double").as("v"))
    val kw = timed("kruskalWallis over 20M rows, 50-value domain") {
      graft.pipeline.Stats.kruskalWallis(kwRows, col("g"), col("v"))
        .collect().head
    }
    assert(kw.getLong(1) == 20000000L, s"n off: $kw")
    assert(kw.getDouble(2) == 0.0 && kw.getDouble(3) == 0.0,
      s"identical groups must give H exactly 0: $kw")

    // decisionStump over 20M rows / 400-value domain with a PLANTED
    // perfect split: y = (x >= 200), so the stump must elect threshold
    // 199 with gain exactly the root Gini 0.5 (both children pure).
    val dsRows = spark.range(20000000L).select(
      (col("id") % 400L).cast("double").as("x"),
      (col("id") % 400L >= 200L).as("y"))
    val ds = timed("decisionStump over 20M rows, 400-value domain") {
      graft.pipeline.Stats.decisionStump(dsRows, col("x"), col("y"))
        .collect().head
    }
    assert(ds.getDouble(2) == 199.0 && ds.getDouble(3) == 0.5,
      s"planted perfect split not found: $ds")

    // equalCountTiles over 10M scored units / 1000-value vocabulary: the
    // r09 global-ntile retirement. 10 tiles of EXACTLY 1M rows each; the
    // score boundaries align with the cuts (100 values x 10k rows per
    // tile), so per-tile (n, min score, max score) are closed-form.
    val ectRows = spark.range(10000000L).select(col("id"),
      (col("id") % 1000L).as("s"))
    val ect = timed("equalCountTiles over 10M units, 1000-value vocabulary") {
      graft.pipeline.Stats.equalCountTiles(ectRows, "s", "id", 10, "tile")
        .groupBy("tile").agg(
          org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.min("s").as("lo"),
          org.apache.spark.sql.functions.max("s").as("hi"))
        .orderBy("tile").collect()
    }
    assert(ect.length == 10, s"expected 10 tiles: ${ect.length}")
    ect.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == 1000000L, s"tile ${i + 1} count off: $r")
      assert(r.getLong(2) == (9 - i) * 100L && r.getLong(3) == (9 - i) * 100L + 99L,
        s"tile ${i + 1} score band off: $r")
    }

    // equalCountTiles over a 10M-row SINGLE-VALUE tie — the massive-tie
    // fixture: every row scores 7, so the whole relation is one singleton
    // segment and the id-grid subdivision must engage (windows ~N/grid,
    // never the 10M-row global sort). Tiles are exact 1M-id slabs.
    val tieRows = spark.range(10000000L).select(col("id"), lit(7L).as("s"))
    val ectTie = timed("equalCountTiles over a 10M-row single-value tie (id-grid subdivision)") {
      graft.pipeline.Stats.equalCountTiles(tieRows, "s", "id", 10, "tile")
        .groupBy("tile").agg(
          org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.min("id").as("lo"),
          org.apache.spark.sql.functions.max("id").as("hi"))
        .orderBy("tile").collect()
    }
    assert(ectTie.length == 10)
    ectTie.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == 1000000L, s"tie tile ${i + 1} count off: $r")
      assert(r.getLong(2) == i * 1000000L && r.getLong(3) == (i + 1) * 1000000L - 1,
        s"tie tile ${i + 1} id slab off: $r")
    }

    // kendallTau over 21M rows on a COMPLETE independent 50x7 grid: the
    // cell rollup is 350 rows regardless of N, the pair join 61k cells²/2,
    // and by exact symmetry concordant = discordant -> tau_b EXACTLY 0.
    // The case proves the new concordance family's cost is the rollup
    // scan, never the pairs.
    val ktRows = spark.range(21000000L).select( // 350 * 60000: complete grid
      (col("id") % 50L).as("x"), (expr("(id div 50) % 7")).as("y"))
    val kt = timed("kendallTau over 21M rows, 50x7 vocabulary") {
      graft.pipeline.Stats.kendallTau(ktRows, col("x"), col("y"))
        .collect().head
    }
    assert(kt.getLong(0) == 21000000L, s"n off: $kt")
    assert(kt.getDouble(1) == kt.getDouble(2),
      s"symmetric grid must balance C and D: $kt")
    assert(kt.getDouble(3) == 0.0, s"tau_b must be exactly 0: $kt")

    // peakConcurrency over 2M intervals in ONE hot day (the residual
    // hazard the sub-day bucketing exists for): starts every 43200 us,
    // each interval exactly half a day long, so active count ramps to
    // EXACTLY 1M and the day-boundary carry into day 1 is exactly 1M.
    // With 24 sub-buckets the 4M boundary points split ~170k/window
    // instead of one 4M-point day partition.
    val pcIv = spark.range(2000000L).select(
      (col("id") * 43200L).as("s"),
      (col("id") * 43200L + 43200000000L).as("e"))
    val pc = timed("peakConcurrency over 2M intervals in one hot day") {
      graft.pipeline.EventAnalytics.peakConcurrency(pcIv, col("s"), col("e"))
        .orderBy("day").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    // ids 1,000,001..1,999,999 span midnight (999,999 of them); id = 1M
    // ends EXACTLY at the boundary and under true [s,e) semantics (the
    // q397 boundary fix) does NOT touch day 1
    assert(pc.toSeq == Seq((0L, 0L, 1000000L), (1L, 999999L, 999999L)),
      s"hot-day concurrency off: ${pc.toSeq}")

    // ---- planted-recall at 1M rows for the four rows-only near-dup
    // surfaces (q30/q31/q47/q49): their PipelineSpec recall gates re-run
    // here at scale so "recall survives the skew caps" is a per-round
    // archived claim, not a toy-scale one.

    // q30 minhash: 1M 40-word docs with globally-unique vocabulary + 500
    // planted near-dups (one word of 40 changed -> Jaccard 35/41 = 0.854
    // >= the 0.8 threshold). Unrelated docs share ZERO shingles, so every
    // reported pair must be planted; banded LSH at 64/16 misses a 0.854
    // pair with probability ~5e-6.
    val mhText = expr("concat_ws(' ', transform(sequence(0, 39), " +
      "j -> concat('w', CAST(id * 40 + j AS STRING))))")
    val mhEdit = expr("concat_ws(' ', transform(sequence(0, 39), " +
      "j -> CASE WHEN j = 17 THEN concat('zz', CAST(id AS STRING)) " +
      "ELSE concat('w', CAST(id * 40 + j AS STRING)) END))")
    val mhCorpus = spark.range(1000000L)
      .select(col("id").as("doc_id"), mhText.as("text"))
      .union(spark.range(0L, 1000000L, 2000L)
        .select((col("id") + 10000000L).as("doc_id"), mhEdit.as("text")))
    val mhPairs = timed("minhash planted recall over 1M docs (q30 at scale)") {
      Dedup.minhashDedup(mhCorpus, "doc_id", "text",
          Dedup.MinHashConfig(64, 16, 3, 0.8))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(mhPairs.forall { case (a, b) => b == a + 10000000L && a % 2000 == 0 },
      s"non-planted pair reported: ${mhPairs.take(5)}")
    println(s"  planted recall: ${mhPairs.size}/500")
    assert(mhPairs.size >= 490, s"minhash recall collapsed: ${mhPairs.size}/500")

    // q31 simhash: same 1M corpus + 500 VERBATIM copies (the q359
    // semantic at scale): identical texts collapse to one signature, so
    // recall must be EXACTLY 500/500 at hamming 0; random 64-bit
    // signatures sit ~32 bits apart, so background pairs at hamming <= 3
    // are ~impossible (P ~ 2.4e-15 per in-bucket candidate).
    val shCorpus = spark.range(1000000L)
      .select(col("id").as("doc_id"), mhText.as("text"))
      .union(spark.range(0L, 1000000L, 2000L)
        .select((col("id") + 20000000L).as("doc_id"), mhText.as("text")))
    val shPairs = timed("simhash planted recall over 1M docs (q31 at scale)") {
      Dedup.simhashDedup(shCorpus, "doc_id", "text", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(shPairs.forall { case (a, b) => b == a + 20000000L && a % 2000 == 0 },
      s"non-planted simhash pair: ${shPairs.take(5)}")
    assert(shPairs.size == 500, s"verbatim recall must be exact: ${shPairs.size}/500")

    // q49 stream near-dup (batch face of the SAME banded-bucket state
    // path): the 500 verbatim copies must all surface at hamming 0
    // through the bounded per-bucket FIFO at 1M-row bucket load.
    val ndHits = timed("nearDupStream planted recall over 1M docs (q49 at scale)") {
      graft.streaming.Streams.nearDupStream(shCorpus, "doc_id", "text",
          maxHamming = 3, capacity = 4096)
        .toDF().select(col("id_a"), col("id_b")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(ndHits.forall { case (a, b) => b == a + 20000000L && a % 2000 == 0 },
      s"non-planted stream pair: ${ndHits.take(5)}")
    assert(ndHits.size == 500, s"stream verbatim recall must be exact: ${ndHits.size}/500")

    // q47 embedding LSH: 1M deterministic pseudo-uniform 64-dim vectors +
    // 1000 planted near-dups (one component shifted 0.3 -> cosine ~0.998).
    // nPlanes=20 keeps buckets ~1 deep at 1M rows (the documented scale
    // knob); 8 tables lose a planted pair with P ~ 1.6e-3 (expected ~1.6
    // of 1000 missed), and a random background pair cannot reach 0.9.
    val embRecBase = spark.range(1000000L).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), j -> " +
        "CAST(pmod(hash(id, j), 2001) - 1000 AS DOUBLE) / 1000.0D)").as("embedding"))
    val embRecCopies = spark.range(0L, 1000000L, 1000L).select(
      (col("id") + 10000000L).as("vec_id"),
      expr("transform(sequence(1, 64), j -> " +
        "CAST(pmod(hash(id, j), 2001) - 1000 AS DOUBLE) / 1000.0D + " +
        "CASE WHEN j = 1 THEN 0.3D ELSE 0.0D END)").as("embedding"))
    val embPairs = timed("embedding LSH planted recall over 1M vectors (q47 at scale)") {
      Similarity.embeddingNearDupPairs(embRecBase.union(embRecCopies), 0.9,
          dim = 64, nPlanes = 20, nTables = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(embPairs.forall { case (a, b) => b == a + 10000000L && a % 1000 == 0 },
      s"non-planted embedding pair: ${embPairs.take(5)}")
    println(s"  planted recall: ${embPairs.size}/1000")
    assert(embPairs.size >= 985, s"embedding recall collapsed: ${embPairs.size}/1000")

    // containmentJoinPrefix over 1M docs with NO block — the r10 q249
    // retirement. 30-token docs from a 4M-token vocabulary + 500 planted
    // 15-token truncations (containment of the fragment in its original
    // is exactly 1.0). The old source-blocked plan would be 10^12 pairs
    // in one block; the prefix join's candidates are bounded by
    // (prefix x full) token-bucket products over rare tokens only.
    val cjBase = spark.range(1000000L).select(col("id").as("doc_id"),
      expr("transform(sequence(1, 30), j -> " +
        "concat('t', pmod(hash(id, j), 4000000)))").as("tk"))
    val cjFrag = spark.range(0L, 1000000L, 2000L).select(
      (col("id") + 10000000L).as("doc_id"),
      expr("transform(sequence(1, 15), j -> " +
        "concat('t', pmod(hash(id, j), 4000000)))").as("tk"))
    val cjPairs = timed("containmentJoinPrefix over 1M docs, no block (q249 at scale)") {
      graft.pipeline.Dedup.containmentJoinPrefix(
          cjBase.union(cjFrag), "doc_id", col("tk"), tauNum = 9, tauDen = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    }
    assert(cjPairs.forall { case (a, b, cba) =>
      b == a + 10000000L && a % 2000 == 0 && cba == 1.0 },
      s"non-planted containment pair: ${cjPairs.take(5).toSeq}")
    assert(cjPairs.length == 500,
      s"planted containment recall must be exact: ${cjPairs.length}/500")

    // ---- the r10 rank-window family at 10M-key grain: each operator's
    // key rollup used to sort in ONE unpartitioned window; all four now
    // route through distributedRank (cell-partitioned windows, O(grid)
    // driver seams). Closed-form oracles per case.

    // whaleShare over 10M keys, ALL-EQUAL cents (1 each) — the massive
    // single-value tie: the whole rollup is one tie cell and must
    // subdivide on the key grid. Cuts and shares are exact.
    val wsRows = spark.range(10000000L)
      .select(col("id").as("u"), lit(0.01).as("v"))
    val wsTie = timed("whaleShare over 10M keys, single-value tie") {
      graft.pipeline.Stats.whaleShare(wsRows, "u", col("v"),
        pcts = Seq(1, 10)).orderBy("pct").collect()
    }
    assert(wsTie.length == 2, s"whaleShare rows: ${wsTie.length}")
    assert(wsTie(0).getInt(0) == 1 && wsTie(0).getLong(1) == 100000L &&
      wsTie(0).getLong(2) == 1L && wsTie(0).getDouble(3) == 0.01,
      s"1% cut off: ${wsTie(0)}")
    assert(wsTie(1).getInt(0) == 10 && wsTie(1).getLong(1) == 1000000L &&
      wsTie(1).getLong(2) == 1L && wsTie(1).getDouble(3) == 0.1,
      s"10% cut off: ${wsTie(1)}")

    // giniIndex over 10M singleton groups with EQUAL weights: a 10M-row
    // weight tie (subdividing on the numeric group key) whose Lorenz
    // curve is the diagonal -> gini exactly 0.
    val giRows = spark.range(10000000L)
      .select(col("id").as("g"), lit(1L).as("w"))
    val gi = timed("giniIndex over 10M equal-weight groups (single-value tie)") {
      graft.pipeline.Stats.giniIndex(giRows, Seq("g"), col("w"))
        .collect().head
    }
    assert(gi.getLong(0) == 10000000L && gi.getLong(1) == 10000000L &&
      gi.getDouble(2) == 0.0, s"equal-weight gini must be 0: $gi")

    // percentRank over 10M rows / 1000-value vocabulary in ONE group:
    // the calibration group IS the population. pr(v) = round(10000v /
    // (N-1), 6) closed-form; every row of a value shares its pr.
    val prRows = spark.range(10000000L).select(lit("g").as("g"),
      (col("id") % 1000L).as("v"))
    val prAgg = timed("percentRank over 10M rows, one group") {
      graft.pipeline.Stats.percentRank(prRows, Seq("g"), "v")
        .groupBy("v").agg(
          org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.min("pr").as("lo"),
          org.apache.spark.sql.functions.max("pr").as("hi"))
        .orderBy("v").collect()
    }
    assert(prAgg.length == 1000, s"value vocabulary off: ${prAgg.length}")
    prAgg.foreach { r =>
      val v = r.getLong(0)
      val exp = java.math.BigDecimal.valueOf(v * 10000.0 / 9999999.0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(r.getLong(1) == 10000L && r.getDouble(2) == exp &&
        r.getDouble(3) == exp, s"pr($v) off: $r (want $exp)")
    }

    // quantileNormalize over 10M rows / 2 corpus-scale groups (5M each,
    // values unique per group, group B = group A + 7): the per-rank
    // reference is rank + 2.5 EXACTLY for every row.
    val qnRows = spark.range(10000000L).select(col("id"),
      pmod(col("id"), lit(2L)).as("g"),
      (expr("id div 2") + pmod(col("id"), lit(2L)) * 7L).as("v"))
    val qnBad = timed("quantileNormalize over 10M rows, two 5M-row groups") {
      val qn = graft.pipeline.Stats.quantileNormalize(qnRows, "g", "id", "v")
      qn.agg(
        org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(when(
          col("norm_value") =!= (col("rank").cast("double") + lit(2.5)),
          1L).otherwise(0L)).as("bad"),
        org.apache.spark.sql.functions.max("rank").as("mr")).collect().head
    }
    assert(qnBad.getLong(0) == 10000000L && qnBad.getLong(1) == 0L &&
      qnBad.getLong(2) == 5000000L,
      s"quantileNormalize closed form violated: $qnBad")

    // abcClassification over 10M SKUs, UNIFORM revenue ($1 = 1e6 micro
    // each): one giant revenue tie cell that must subdivide on the key
    // grid; cum at rank r is exactly r·1e6, so the exact decimal boundary
    // yields the closed-form 80/15/5 key split with exact shares.
    val abcRows = spark.range(10000000L).select(col("id").as("k"))
    val abc = timed("abcClassification over 10M SKUs, uniform revenue (single-value tie)") {
      graft.pipeline.Finance.abcClassification(abcRows, "k", lit(1000000L))
        .orderBy("abc_class").collect()
    }
    assert(abc.length == 3, s"abc classes: ${abc.length}")
    val abcExp = Seq(("A", 8000000L, 8000000.0, 0.8),
      ("B", 1500000L, 1500000.0, 0.15), ("C", 500000L, 500000.0, 0.05))
    abc.zip(abcExp).foreach { case (r, (cls, nk, rev, share)) =>
      assert(r.getString(0) == cls && r.getLong(1) == nk &&
        r.getDouble(2) == rev && r.getDouble(3) == share,
        s"abc closed form violated: $r (want ($cls,$nk,$rev,$share))")
    }

    // keySkewReport over 10M keys (round 14): the diagnostic meant for
    // suspect keys must itself survive a huge key domain. Uniform face:
    // 20M rows / 10M keys of count 2 — ONE giant count-tie cell that must
    // subdivide on the numeric key grid; gini telescopes to exactly 0,
    // max_share 2/20M rounds to 0, top10_share 20/20M = 1e-6 exactly.
    val ksrU = timed("keySkewReport over 20M rows, 10M uniform keys (single-tie cell)") {
      graft.operators.Ops.keySkewReport(
        spark.range(20000000L).select(expr("id div 2").as("k")), "k")
        .collect().head
    }
    assert(ksrU.getLong(0) == 20000000L && ksrU.getLong(1) == 10000000L &&
      ksrU.getLong(2) == 2L && ksrU.getDouble(3) == 0.0 &&
      ksrU.getDouble(4) == 1e-6 && ksrU.getDouble(5) == 0.0,
      s"keySkewReport uniform closed form violated: $ksrU")
    // hot face: 10M rows, one key holding 1M of them + 9M singletons —
    // and the keys are STRINGS, so the 9M count=1 tie cell can only
    // subdivide on the xxhash64 head tiebreak (a raw string tiebreak
    // would leave it to one window task; every output is tie-invariant,
    // which is what makes the hash order free). max_share = 0.1 exactly;
    // top10 = (1e6 + 9)/1e7 = 0.100001 at 6dp;
    // Σ r·n = 49,500,005,500,000 exactly -> gini rounds to 0.1.
    val ksrH = timed("keySkewReport over 10M rows, one 10%-hot STRING key") {
      graft.operators.Ops.keySkewReport(
        spark.range(10000000L).select(
          when(col("id") < 1000000L, lit("hot"))
            .otherwise(concat(lit("u"), col("id").cast("string"))).as("k")),
        "k").collect().head
    }
    assert(ksrH.getLong(0) == 10000000L && ksrH.getLong(1) == 9000001L &&
      ksrH.getLong(2) == 1000000L && ksrH.getDouble(3) == 0.1 &&
      ksrH.getDouble(4) == 0.100001 && ksrH.getDouble(5) == 0.1,
      s"keySkewReport hot closed form violated: $ksrH")

    // conoverSquaredRanks over 20M rows / 50-value domain: the two groups
    // are identical multisets (10M each, 200k per value), so both medians,
    // both deviation distributions, and therefore T = n_a*S2/N agree
    // EXACTLY -> z = 0 with no float tolerance at all.
    val csRows = spark.range(20000000L).select(
      pmod(col("id"), lit(2L)).cast("string").as("g"),
      (expr("id div 2") % 50L).cast("double").as("v"))
    val cs = timed("conoverSquaredRanks over 20M rows, 50-value domain") {
      graft.pipeline.Stats.conoverSquaredRanks(csRows, "g", "v", "0", "1")
        .collect().head
    }
    assert(cs.getLong(0) == 10000000L && cs.getLong(1) == 10000000L &&
      cs.getDouble(3) == 0.0, s"conover closed form violated: $cs")

    // brunnerMunzel on the same identical-multiset design: mean pooled
    // ranks agree exactly -> t = 0 and p_hat = 1/2 EXACTLY (dyadic).
    val bm = timed("brunnerMunzel over 20M rows, 50-value domain") {
      graft.pipeline.Stats.brunnerMunzel(csRows, "g", "v", "0", "1")
        .collect().head
    }
    assert(bm.getDouble(2) == 0.5 && bm.getDouble(3) == 0.0,
      s"brunnerMunzel closed form violated: $bm")

    // fisherExact at the 2^20 support gate boundary: N = 2^21 rows with
    // id%4 encoding perfectly independent margins (r1 = c1 = 2^20,
    // a = 2^19 = the hypergeometric mode), so EVERY mass <= mass(obs)
    // -> two-sided p = 1 exactly; the 1M-term support cumsum must not
    // blow up.
    val feRows = spark.range(2097152L).select(
      (pmod(col("id"), lit(2L)) === 0L).as("r"),
      (pmod(col("id"), lit(4L)) < 2L).as("c"))
    val fe = timed("fisherExact over 2^21 rows, 2^20-wide support") {
      graft.pipeline.Stats.fisherExact(feRows, col("r"), col("c"))
        .collect().head
    }
    assert(fe.getLong(1) == 1048576L && fe.getLong(3) == 524288L &&
      fe.getDouble(5) == 1.0, s"fisherExact closed form violated: $fe")

    // quadeTest over 1M units x 3 conditions: alternating (1,2,3)/(3,2,1)
    // patterns share one range (all Q midranks tie) and cancel per
    // condition -> every S_j = 0 -> F = 0 EXACTLY; the range rollup is a
    // single row, the rank windows all partition by unit.
    val quRows = spark.range(1000000L).selectExpr("id AS u",
        "CASE WHEN id % 2 = 0 THEN 1.0 ELSE 3.0 END AS va",
        "2.0 AS vb",
        "CASE WHEN id % 2 = 0 THEN 3.0 ELSE 1.0 END AS vc")
      .selectExpr("u", "stack(3, 'A', va, 'B', vb, 'C', vc) AS (c, v)")
    val qu = timed("quadeTest over 1M units x 3 conditions") {
      graft.pipeline.Stats.quadeTest(quRows, col("u"), col("c"), col("v"))
        .collect().head
    }
    assert(qu.getLong(0) == 1000000L && qu.getLong(1) == 3L &&
      qu.getDouble(2) == 0.0, s"quade closed form violated: $qu")

    // historicalVar over 10M bars / 1000 tickers: every close climbs one
    // cent per day, so all 9999 per-key diffs are +1 -> the ceil-rank
    // tail is 500 ones: var = cvar = 0.01 for every key, all windows
    // key-partitioned.
    val hvRows = spark.range(10000000L).select(
      (col("id") % 1000L).as("key"), expr("id div 1000").as("day"),
      ((expr("id div 1000") + 1L).cast("double") / 100.0).as("close"))
    val hv = timed("historicalVar over 10M bars, 1000 tickers") {
      graft.pipeline.Finance.historicalVar(hvRows, "key", "day",
          col("close"), alpha = 0.05)
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_diffs") === 9999L && col("n_tail") === 500L &&
            col("var_amt") === 0.01 && col("cvar_amt") === 0.01, 1L)
            .otherwise(0L)).as("ok")).collect().head
    }
    assert(hv.getLong(0) == 1000L && hv.getLong(1) == 1000L,
      s"historicalVar closed form violated: $hv")

    // distributionDistance over 20M rows with IDENTICAL group
    // distributions: TVD numerator cancels exactly (decimal integers),
    // Bhattacharyya = 1 -> Hellinger 0 with no float tolerance.
    val ddRows = spark.range(20000000L).select(
      pmod(col("id"), lit(2L)).cast("string").as("g"),
      (expr("id div 2") % 50L).cast("double").as("c"))
    val dd = timed("distributionDistance over 20M rows, identical groups") {
      graft.pipeline.Stats.distributionDistance(ddRows, "g", col("c"),
        "0", "1").collect().head
    }
    assert(dd.getDouble(3) == 0.0 && dd.getDouble(4) == 1.0 &&
      dd.getDouble(5) == 0.0, s"distributionDistance closed form: $dd")

    // weightedKappa over 10M units in perfect diagonal agreement across
    // 5 codes: every disagreement weight multiplies a zero cell ->
    // both kappas exactly 1.
    val wkRows = spark.range(10000000L).select(
      (col("id") % 5L).as("a"), (col("id") % 5L).as("b"))
    val wk = timed("weightedKappa over 10M units, perfect agreement") {
      graft.pipeline.Stats.weightedKappa(wkRows, col("a"), col("b"))
        .collect().head
    }
    assert(wk.getLong(0) == 10000000L && wk.getDouble(1) == 1.0 &&
      wk.getDouble(2) == 1.0, s"weightedKappa closed form: $wk")

    // qnScale over 20M rows / 50-value uniform domain: the k-th pairwise
    // gap (k = C(10M+1, 2)) lands on gap 7 by exact integer cumcounts.
    val qnsRows = spark.range(20000000L)
      .select((col("id") % 50L).cast("double").as("v"))
    val qn = timed("qnScale over 20M rows, 50-value domain") {
      graft.pipeline.Stats.qnScale(qnsRows, col("v")).collect().head
    }
    assert(qn.getLong(0) == 20000000L && qn.getDouble(2) == 7.0 &&
      qn.getDouble(3) == 15.5533, s"qnScale closed form: $qn")

    // ratioMetricCi over 10M units with x = 2y exactly: the delta
    // variance vx + 4vy - 4cxy cancels to 0 -> se = 0, lo = hi = 2.
    val rcRows = spark.range(10000000L).select(
      ((col("id") % 3L) + 1L).cast("double").as("y"))
      .select((col("y") * 2.0).as("x"), col("y"))
    val rc = timed("ratioMetricCi over 10M units, exact ratio 2") {
      graft.pipeline.Stats.ratioMetricCi(rcRows, col("x"), col("y"))
        .collect().head
    }
    assert(rc.getDouble(1) == 2.0 && rc.getDouble(2) == 0.0 &&
      rc.getDouble(3) == 2.0 && rc.getDouble(4) == 2.0,
      s"ratioMetricCi closed form: $rc")

    // taylorsLaw over 1M two-row groups with var = 2*mean^2 exactly
    // (values {0, 2m}): ln var = ln 2 + 2 ln mean -> slope 2, r = 1.
    val tlRows = spark.range(2000000L).select(
      expr("id div 2").as("g"),
      (pmod(col("id"), lit(2L)).cast("double") *
        (expr("id div 2") + 1L).cast("double") * 2.0).as("v"))
    val tl = timed("taylorsLaw over 1M groups, exact power law") {
      graft.pipeline.Stats.taylorsLaw(tlRows, col("g"), col("v"))
        .collect().head
    }
    assert(tl.getLong(0) == 1000000L && tl.getDouble(2) == 2.0 &&
      tl.getDouble(4) == 1.0, s"taylorsLaw closed form: $tl")

    // hillEstimator over 10M rows: (a) a 312k-deep tie at the top makes
    // the k+1 order statistics ALL equal -> xi exactly 0, alpha null
    // (the tie-break determinism gate); (b) v = id+1 at k = 3 matches
    // the driver-side replay of the same IEEE shapes.
    val hillTies = spark.range(10000000L).select(
      pow(lit(2.0), pmod(col("id"), lit(32L)).cast("double")).as("v"),
      col("id").as("tie"))
    val h0 = timed("hillEstimator over 10M rows, 312k-deep top tie") {
      graft.pipeline.Stats.hillEstimator(hillTies, col("v"), col("tie"),
        k = 100).collect().head
    }
    assert(h0.getDouble(2) == 0.0 && h0.isNullAt(3),
      s"hill tie closed form: $h0")
    val hillSeq = spark.range(10000000L).select(
      (col("id") + 1L).cast("double").as("v"), col("id").as("tie"))
    val h1 = timed("hillEstimator over 10M distinct values, k = 3") {
      graft.pipeline.Stats.hillEstimator(hillSeq, col("v"), col("tie"),
        k = 3).collect().head
    }
    val hThr = 10000000.0 - 3.0
    val xiExp = ((math.log(10000000.0 / hThr) +
      math.log(9999999.0 / hThr)) + math.log(9999998.0 / hThr)) / 3.0
    assert(h1.getDouble(1) == hThr, s"hill threshold: $h1")
    assert(h1.getDouble(2) == math.rint(xiExp * 1e6) / 1e6,
      s"hill xi vs driver replay: $h1 vs $xiExp")

    // moransI / gearysC on a 1000x1000 checkerboard (counts 1/3):
    // every rook neighbor pair is opposite, so I = -1 EXACTLY and
    // C = (N-1)*4W*N^2/(2W*N^2) scaled = 1.999998 at N = 1e6.
    val board = spark.range(1000000L).select(
        pmod(col("id"), lit(1000L)).as("x"), expr("id div 1000").as("y"))
      .withColumn("p", pmod(col("x") + col("y"), lit(2L)))
      .select(col("x"), col("y"),
        explode(sequence(lit(1L), lit(1L) + col("p") * 2L)).as("rep"))
    val mi = timed("moransI on a 1M-cell checkerboard (2M points)") {
      graft.pipeline.Spatial.moransI(board, col("x"), col("y"),
        cellSize = 1L).collect().head
    }
    assert(mi.getLong(0) == 1000000L && mi.getDouble(2) == -1.0,
      s"moransI checkerboard: $mi")
    val gc = timed("gearysC on the same checkerboard") {
      graft.pipeline.Spatial.gearysC(board, col("x"), col("y"),
        cellSize = 1L).collect().head
    }
    assert(gc.getDouble(2) == 1.999998, s"gearysC checkerboard: $gc")

    // ppccExponential over 10M rows whose values ARE the Blom
    // exponential plotting quantiles -> r = 1 exactly (and the 10M-row
    // distributedRank pass is the cost being measured).
    val nPp = 10000000L
    val ppRows = spark.range(nPp).select(
      (-log(lit(1.0) - ((col("id") + 1L).cast("double") - 0.375) /
        (lit(nPp.toDouble) + 0.25))).as("v"), col("id").as("tie"))
    val pp = timed("ppccExponential over 10M exact quantiles") {
      graft.pipeline.Stats.ppccExponential(ppRows, col("v"), col("tie"))
        .collect().head
    }
    assert(pp.getLong(0) == nPp && pp.getDouble(1) == 1.0,
      s"ppcc closed form: $pp")

    // stuartMaxwell3 over 10M pairs with identical margins by
    // construction (r = id%3, c = (id+1)%3): every d_i = 0 with massive
    // off-diagonals -> chi2 exactly 0.
    val smRows = spark.range(9999999L).select(
      when(pmod(col("id"), lit(3L)) === 0L, "l")
        .when(pmod(col("id"), lit(3L)) === 1L, "m").otherwise("h").as("r"),
      when(pmod(col("id") + 1L, lit(3L)) === 0L, "l")
        .when(pmod(col("id") + 1L, lit(3L)) === 1L, "m").otherwise("h")
        .as("c"))
    val sm = timed("stuartMaxwell3 over 10M pairs, planted equal margins") {
      graft.pipeline.Stats.stuartMaxwell3(smRows, col("r"), col("c"),
        Seq("l", "m", "h")).collect().head
    }
    assert(sm.getLong(1) == 0L && sm.getLong(2) == 0L &&
      sm.getLong(3) == 0L && sm.getDouble(4) == 0.0,
      s"stuartMaxwell closed form: $sm")

    // momentumBacktest over 1000 tickers x 1000 days with a planted
    // strictly-monotone cross-section (sig increasing in t every day):
    // all 994 tradable days emit and the long-short spread is positive.
    val momBars = spark.range(1000000L).select(
        pmod(col("id"), lit(1000L)).as("key"),
        expr("id div 1000").as("day"))
      .select(col("key"), col("day"),
        ((lit(1000000L) + col("key") * col("day")).cast("double") / 100.0)
          .as("close"))
    val mom = timed("momentumBacktest over 1000 tickers x 1000 days") {
      graft.pipeline.Finance.momentumBacktest(momBars, "key", "day",
        col("close"), lookback = 5, k = 5).collect().head
    }
    assert(mom.getLong(0) == 994L && mom.getDouble(1) > 0.0,
      s"momentum planted monotone: $mom")

    // ---- round-13 streaming batch faces at 10M-event scale.
    // slidingCounts: 10M events spread uniformly over 1000 hour-aligned
    // slots x 2 INDEPENDENT types (slot = id div 2 so parity never
    // correlates with the slot) -> the 6h/3h window explode doubles
    // mass exactly; every interior window holds 6 slots x 5000 per
    // type; starts run -3h..999h (335 x 2 types = 670 cells).
    val slideEv = spark.range(10000000L).select(
      timestamp_micros(expr("(id div 2) % 1000") * lit(3600000000L)).as("ts"),
      pmod(col("id"), lit(2L)).cast("string").as("event_type"))
    val slide = timed("slidingCounts over 10M events, 1000-hour spine") {
      graft.streaming.Streams.slidingCounts(slideEv)
        .agg(count(lit(1)).as("cells"), sum(col("n")).as("mass"),
          max(col("n")).as("mx")).collect().head
    }
    assert(slide.getLong(1) == 20000000L,
      s"sliding mass must be exactly 2x events: $slide")
    assert(slide.getLong(0) == 670L && slide.getLong(2) == 30000L,
      s"sliding closed form violated: $slide")

    // hourlyPeakPerDay: 10M events laid id = 24q + h over 1000 days
    // (day = q % 1000, hour = h) -> within every day the hour counts
    // tie at 416/417, so the chained two-tier election must settle on
    // the deterministic tie-break: the EARLIEST hour, i.e. every day's
    // peak lands exactly on its own day start.
    val peakEv = spark.range(10000000L).select(
      timestamp_micros(expr("(id div 24) % 1000") * lit(86400000000L) +
        pmod(col("id"), lit(24L)) * lit(3600000000L)).as("ts"))
    val peak = timed("hourlyPeakPerDay over 10M events, 1000-day spine") {
      graft.streaming.Streams.hourlyPeakPerDay(peakEv)
        .agg(count(lit(1)).as("days"),
          sum(when(col("peak_hour_us") === col("day_start_us"), 1L)
            .otherwise(0L)).as("peak_at_0"),
          min(col("peak_n")).as("mn"), max(col("peak_n")).as("mx"))
        .collect().head
    }
    assert(peak.getLong(0) == 1000L && peak.getLong(1) == 1000L,
      s"chained-window tie election must take the earliest hour: $peak")
    // q = id div 24 runs 0..416666: days 0..666 see 417 blocks, days
    // 667..999 see 416 (the final partial block stops at hour 15)
    assert(peak.getLong(2) == 416L && peak.getLong(3) == 417L,
      s"peak counts off (want 416..417): $peak")

    // outer attribution at 10M purchases x 10M views: user u purchases
    // at minute u%1440; even users also view 30 min earlier -> exactly
    // the odd users come back organic. The left interval join stays an
    // equi join on the user key (PlanSpec pins the shape at sf).
    val purch = spark.range(10000000L).select(col("id").as("user_id"),
      timestamp_micros(lit(86400000000L) +
        pmod(col("id"), lit(1440L)) * 60000000L).as("ts"),
      col("id").as("event_id"))
    val views = spark.range(10000000L)
      .filter(pmod(col("id"), lit(2L)) === 0L)
      .select(col("id").as("user_id"),
        timestamp_micros(lit(86400000000L) +
          pmod(col("id"), lit(1440L)) * 60000000L - lit(1800000000L)).as("ts"),
        (col("id") + 100000000L).as("event_id"))
    val outer = timed("left-outer attribution join over 10M x 5M (batch face)") {
      graft.streaming.Streams.enrichStream(purch, views, "user_id",
          joinWindowSec = 3600L, joinType = "left_outer")
        .agg(count(lit(1)).as("rows"),
          sum(when(col("l_event_id").isNull, 1L).otherwise(0L)).as("organic"))
        .collect().head
    }
    assert(outer.getLong(0) == 10000000L && outer.getLong(1) == 5000000L,
      s"outer attribution closed form violated: $outer")

    spark.stop()
  }
}
