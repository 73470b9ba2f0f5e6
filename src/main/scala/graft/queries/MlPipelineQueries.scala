package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ops
import graft.pipeline.{EventAnalytics, Graph, Similarity, Stats,
  TextAnalysis => TA}

/** ML-pipeline operator drivers (round-9 wave): vector compression (product
  * quantization), item-kNN recommendation, weighted shortest paths, sketch
  * certification, keyword extraction, snapshot drift, forecasting baselines,
  * clamped inventory levels, and golden-record survivorship. Each entry
  * names the library operator it exercises; every one is oracle-checked.
  */
object MlPipelineQueries {

  /** Integer weight on the co-purchase edge (a, b): 1 + (a+b) mod 5 —
    * deterministic, mirrored literally in the oracle. */
  private val edgeWeightSql = "1 + (a + b) % 5"

  val qs: Seq[Q] = Seq(

    // ---- product-quantization codes: codebooks are plan literals on BOTH
    // engines (VALUES list in the oracle, embedded constants in Spark's
    // generated code — the q35 centroid discipline), so the per-subspace
    // argmin is engine-exact; DuckDB's list_distance is the sqrt of the
    // same in-order fold, monotone for the tie-broken ORDER BY.
    Q("q184_pq_encode",
      Some {
        val values = Similarity.pqCodebooks(nSub = 4, subDim = 16, k = 8)
          .map { case (m, c, v) => s"($m, $c, [${v.mkString(", ")}])" }
          .mkString(", ")
        s"WITH cb(m, cid, cv) AS (VALUES $values), " +
          "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
          "FROM embeddings), " +
          "d AS (SELECT vec_id, m AS subspace, cid, " +
          "list_distance(v[m * 16 + 1 : m * 16 + 16], cv) AS dist " +
          "FROM e CROSS JOIN cb), " +
          "r AS (SELECT vec_id, subspace, cid, row_number() OVER " +
          "(PARTITION BY vec_id, subspace ORDER BY dist, cid) AS rn FROM d) " +
          "SELECT vec_id, subspace, cid AS code FROM r WHERE rn = 1 " +
          "ORDER BY vec_id, subspace"
      },
      (s, dir) => Similarity.pqEncode(Tables.embeddings(s, dir),
          nSub = 4, subDim = 16, k = 8)
        .orderBy("vec_id", "subspace")),

    // ---- item-kNN "customers also bought" over order baskets: similarity
    // matrix pruned to 20 neighbors per item BEFORE the basket join, scores
    // accumulate as DECIMAL(18,6) of 6dp-rounded cosines (exact,
    // order-independent), ranks computed per user THEN the report slices a
    // user subset.
    Q("q185_recommend",
      // bc = the pair stage's deterministically capped basket (maxBasket
      // 1024 in md5("cc|"||user||"|"||item) order — recommendTopK's scale
      // guard, user-salted so the draw decorrelates across baskets;
      // non-binding at this sf but replicated so the oracle checks the
      // capped semantics, not fixture luck). Scoring (sc) and the owned
      // exclusion (an) keep the FULL basket b, exactly like the operator.
      Some("WITH b AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i " +
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey), " +
        "bc AS (SELECT u, i FROM (SELECT u, i, row_number() OVER " +
        "(PARTITION BY u ORDER BY md5('cc|' || coalesce(CAST(u AS VARCHAR), '') " +
        "|| '|' || coalesce(CAST(i AS VARCHAR), '')), " +
        "i IS NULL, i) " +
        "AS brn FROM b) WHERE brn <= 1024), " +
        "m AS (SELECT i, count(*) AS n FROM bc GROUP BY 1), " +
        "p AS (SELECT x.i AS ia, y.i AS ib, count(*) AS nb FROM bc x " +
        "JOIN bc y ON x.u = y.u AND x.i < y.i GROUP BY 1, 2 " +
        "HAVING count(*) >= 2), " +
        "sm AS (SELECT ia, ib, CAST(round(CAST(nb AS DOUBLE) / " +
        "sqrt(CAST(ma.n * mb.n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS sim " +
        "FROM p JOIN m ma ON ia = ma.i JOIN m mb ON ib = mb.i), " +
        "dr AS (SELECT ia AS i, ib AS j, sim FROM sm " +
        "UNION ALL SELECT ib, ia, sim FROM sm), " +
        "nb2 AS (SELECT i, j, sim FROM (SELECT i, j, sim, row_number() OVER " +
        "(PARTITION BY i ORDER BY sim DESC, j) AS rn FROM dr) WHERE rn <= 20), " +
        "sc AS (SELECT b.u, nb2.j, sum(sim) AS score FROM b " +
        "JOIN nb2 ON b.i = nb2.i GROUP BY 1, 2), " +
        "an AS (SELECT sc.u, sc.j, sc.score FROM sc WHERE NOT EXISTS " +
        "(SELECT 1 FROM b WHERE b.u = sc.u AND b.i = sc.j)), " +
        "r AS (SELECT u, j, score, row_number() OVER (PARTITION BY u " +
        "ORDER BY score DESC, j) AS rank FROM an) " +
        // CAST rank to INTEGER: DuckDB row_number() is BIGINT, Spark's int
        "SELECT u AS user, j AS item, CAST(score AS DOUBLE) AS score, " +
        "CAST(rank AS INTEGER) AS rank " +
        "FROM r WHERE rank <= 3 AND u % 47 = 0 ORDER BY user, rank"),
      (s, dir) => {
        val baskets = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .select("o_custkey", "l_partkey")
        EventAnalytics.recommendTopK(baskets, "o_custkey", "l_partkey",
            k = 3, minUsers = 2L, maxNeighbors = 20)
          .filter(pmod(col("user"), lit(47L)) === 0)
          .orderBy("user", "rank")
      }),

    // ---- weighted shortest paths (3 relaxation rounds) from the sparse
    // seed set over the co-purchase graph — q165's weighted sibling; the
    // oracle unrolls the same min-plus rounds (MATERIALIZED, the q156
    // lesson). Distances are integer sums — exact on any engine.
    Q("q186_sssp",
      Some("WITH " + AppliedQueries.copurchaseEdgesSql + ", " +
        s"ew AS MATERIALIZED (SELECT a, b, $edgeWeightSql AS w FROM e0), " +
        "adj AS MATERIALIZED (SELECT a AS u, b AS v, w FROM ew " +
        "UNION ALL SELECT b, a, w FROM ew), " +
        "d0 AS MATERIALIZED (SELECT DISTINCT p_partkey AS node, " +
        "CAST(0 AS BIGINT) AS dist FROM part WHERE p_partkey % 97 = 0), " +
        "d1 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM " +
        "(SELECT node, dist FROM d0 UNION ALL SELECT v, dist + w " +
        "FROM d0 JOIN adj ON node = u) GROUP BY 1), " +
        "d2 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM " +
        "(SELECT node, dist FROM d1 UNION ALL SELECT v, dist + w " +
        "FROM d1 JOIN adj ON node = u) GROUP BY 1), " +
        "d3 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM " +
        "(SELECT node, dist FROM d2 UNION ALL SELECT v, dist + w " +
        "FROM d2 JOIN adj ON node = u) GROUP BY 1) " +
        "SELECT node, dist FROM d3 ORDER BY node"),
      (s, dir) => {
        val e = AppliedQueries.copurchaseEdges(s, dir)
          .withColumn("w", lit(1L) + pmod(col("src") + col("dst"), lit(5L)))
        Graph.ssspDistances(e, "src", "dst", "w",
            Tables.part(s, dir).filter(pmod(col("p_partkey"), lit(97L)) === 0),
            "p_partkey", rounds = 3)
          .orderBy("node")
      }),

    // ---- per-seed harmonic centrality within 3 hops over the
    // co-purchase graph (q186's sibling: per-SEED distances, not the
    // multi-source min): Σ 1/d for reached nodes, 1/d terms in
    // DECIMAL(28,12); seeds are the sparse %97 sample — the bound that
    // keeps (seed, node) state linear, never all-pairs.
    Q("q380_harmonic_centrality",
      Some("WITH " + AppliedQueries.copurchaseEdgesSql + ", " +
        "adj AS MATERIALIZED (SELECT a AS u, b AS v FROM e0 " +
        "UNION SELECT b, a FROM e0), " +
        "d0 AS MATERIALIZED (SELECT DISTINCT p_partkey AS seed, " +
        "p_partkey AS node, CAST(0 AS BIGINT) AS dist FROM part " +
        "WHERE p_partkey % 97 = 0), " +
        "d1 AS MATERIALIZED (SELECT seed, node, min(dist) AS dist FROM " +
        "(SELECT seed, node, dist FROM d0 UNION ALL SELECT seed, v, " +
        "dist + 1 FROM d0 JOIN adj ON node = u) GROUP BY 1, 2), " +
        "d2 AS MATERIALIZED (SELECT seed, node, min(dist) AS dist FROM " +
        "(SELECT seed, node, dist FROM d1 UNION ALL SELECT seed, v, " +
        "dist + 1 FROM d1 JOIN adj ON node = u) GROUP BY 1, 2), " +
        "d3 AS MATERIALIZED (SELECT seed, node, min(dist) AS dist FROM " +
        "(SELECT seed, node, dist FROM d2 UNION ALL SELECT seed, v, " +
        "dist + 1 FROM d2 JOIN adj ON node = u) GROUP BY 1, 2) " +
        "SELECT seed, CAST(count(*) AS BIGINT) AS n_reached, " +
        "round(CAST(sum(CAST(1.0 / CAST(dist AS DOUBLE) " +
        "AS DECIMAL(28,12))) AS DOUBLE), 6) AS harmonic " +
        "FROM d3 WHERE dist > 0 GROUP BY 1 ORDER BY seed"),
      (s, dir) => Graph.harmonicCentrality(
          AppliedQueries.copurchaseEdges(s, dir), "src", "dst",
          Tables.part(s, dir)
            .filter(pmod(col("p_partkey"), lit(97L)) === 0),
          "p_partkey", rounds = 3)
        .orderBy("seed")),

    // ---- daily unique-user report: exact counts hash-gate; the HLL
    // certification flag is each engine's verdict on ITS OWN sketch, so a
    // sketch error past tolerance on either side would flip the boolean
    // nondeterministically — the flag is therefore spec-asserted
    // (MlPipelineSpec) and DROPPED from the gated surface, not hash-gated
    // (tightening of the q43 discipline per round-6 advice).
    Q("q187_daily_uniques",
      Some("SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_events, " +
        "count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY 1 ORDER BY day"),
      (s, dir) => EventAnalytics.dailyUniqueReport(Tables.events(s, dir),
          "user_id", "ts")
        .drop("hll_ok")
        .orderBy("day")),

    // ---- RAKE keyword extraction: stopword-delimited phrase runs, word
    // degree/freq from exact integer tallies, top-50 by the one-division
    // score. The SINGLE stopword alternation pass is mirrored literally
    // (RE2 and Java agree on \b + lowercase-ascii alternations: the
    // \b...\b anchors leave exactly one viable alternative per word).
    Q("q188_keywords",
      Some {
        val chain = "regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z]+', ' ', 'g'), " +
          s"'\\b(${TA.RakeStopwords.mkString("|")})\\b', '|', 'g')"
        s"WITH d AS (SELECT $chain AS t FROM documents), " +
          "p AS (SELECT unnest(string_split_regex(t, '\\|+')) AS ph FROM d), " +
          "ws AS (SELECT string_split_regex(trim(ph), ' +') AS arr FROM p " +
          "WHERE trim(ph) <> ''), " +
          "w AS (SELECT len(arr) AS l, unnest(arr) AS word FROM ws) " +
          "SELECT word, count(*) AS freq, CAST(sum(l) AS BIGINT) AS degree, " +
          "round(CAST(sum(l) AS DOUBLE) / count(*), 6) AS score " +
          "FROM w GROUP BY 1 ORDER BY score DESC, word LIMIT 50"
      },
      (s, dir) => TA.rakeKeywords(Tables.documents(s, dir), "text")
        .orderBy(col("score").desc, col("word").asc).limit(50)),

    // ---- snapshot drift report: the column profiler runs on the pre- and
    // post-cutoff halves of the event log and the column-keyed join reports
    // null-rate / distinct-cardinality movement — the acceptance check for
    // a new data drop.
    Q("q189_schema_drift",
      Some {
        def prof(pred: String) = Seq("user_id", "event_type", "value")
          .map { c =>
            s"SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull, " +
              s"COUNT(DISTINCT $c) AS n_distinct FROM events WHERE $pred"
          }.mkString(" UNION ALL ")
        "WITH b AS (" + prof("ts < TIMESTAMP '2024-01-16'") + "), " +
          "a AS (" + prof("ts >= TIMESTAMP '2024-01-16'") + ") " +
          "SELECT b.col_name, " +
          "round(CAST(b.n_rows - b.n_nonnull AS DOUBLE) / b.n_rows, 6) AS null_rate_before, " +
          "round(CAST(a.n_rows - a.n_nonnull AS DOUBLE) / a.n_rows, 6) AS null_rate_after, " +
          "b.n_distinct AS distinct_before, a.n_distinct AS distinct_after, " +
          "round(CAST(a.n_distinct AS DOUBLE) / b.n_distinct, 6) AS distinct_ratio " +
          "FROM b JOIN a USING (col_name) ORDER BY col_name"
      },
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cut = lit("2024-01-16").cast("timestamp")
        Ops.profileDrift(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
            Seq("user_id", "event_type", "value"))
          .orderBy("col_name")
      }),

    // ---- seasonal-naive forecast backtest: pred(d) = actual(d − 7) over
    // the zero-filled day spine, last 28 days — integer-exact error rows.
    Q("q190_forecast",
      Some("WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "sp AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "f AS (SELECT sp.day, coalesce(n, 0) AS n FROM sp LEFT JOIN c USING (day)), " +
        "l AS (SELECT day, n, lag(n, 7) OVER (ORDER BY day) AS pred FROM f) " +
        "SELECT day, n AS actual, pred AS predicted, abs(n - pred) AS abs_err " +
        "FROM l WHERE day > (SELECT max(day) FROM f) - 28 AND pred IS NOT NULL " +
        "ORDER BY day"),
      (s, dir) => EventAnalytics.seasonalNaiveBacktest(Tables.events(s, dir),
          "ts", season = 7, horizon = 28)
        .orderBy("day")),

    // ---- clamped running inventory per part: receipts add, returns drain,
    // the level floors at zero — the sequential recurrence runs as its
    // prefix-sum closed form on ONE part-keyed window sort.
    Q("q191_inventory",
      Some("WITH m AS (SELECT l_partkey AS key, " +
        "CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT) " +
        "ELSE CAST(l_quantity AS BIGINT) END AS d, " +
        "epoch_us(l_shipdate) AS us, l_orderkey AS ok, l_linenumber AS ln " +
        "FROM lineitem), " +
        "s AS (SELECT key, us, ok, ln, sum(d) OVER w AS ps FROM m WINDOW w AS " +
        "(PARTITION BY key ORDER BY us, ok, ln ROWS UNBOUNDED PRECEDING)), " +
        // CAST to BIGINT: DuckDB window sum() yields HUGEINT → pandas
        // float64, while Spark emits int64 — the driver hash is
        // dtype-sensitive (lvl feeds both final_level and peak_level)
        "l AS (SELECT key, us, ok, ln, CAST(ps - least(CAST(0 AS BIGINT), " +
        "min(ps) OVER w2) AS BIGINT) AS lvl FROM s WINDOW w2 AS " +
        "(PARTITION BY key ORDER BY us, ok, ln ROWS UNBOUNDED PRECEDING)), " +
        "r AS (SELECT key, lvl, row_number() OVER (PARTITION BY key " +
        "ORDER BY us DESC, ok DESC, ln DESC) AS rn FROM l), " +
        "g AS (SELECT key, count(*) AS n_moves, max(lvl) AS peak_level " +
        "FROM l GROUP BY 1) " +
        "SELECT g.key, g.n_moves, r.lvl AS final_level, g.peak_level " +
        "FROM g JOIN r ON g.key = r.key AND r.rn = 1 ORDER BY g.key"),
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        Stats.clampedRunningLevel(li, "l_partkey",
            when(col("l_returnflag") === "R", -col("l_quantity"))
              .otherwise(col("l_quantity")),
            Seq(EventAnalytics.micros(col("l_shipdate")), col("l_orderkey"),
              col("l_linenumber")))
          .select(col("key"), col("n_moves"), col("final_level"), col("peak_level"))
          .orderBy("key")
      }),

    // ---- golden-record survivorship over PLANTED duplicate clusters: the
    // cluster key is a content fingerprint prefix, two planted copy tiers
    // skew the lang vote and the char count; mode elections are count-DESC
    // value-ASC deterministic.
    Q("q192_survivorship",
      Some("WITH base AS (SELECT doc_id, md5(substring(text, 1, 40)) AS cluster, " +
        "lang, n_chars FROM documents), " +
        "c1 AS (SELECT doc_id + 1000000 AS doc_id, cluster, lang, n_chars + 7 " +
        "AS n_chars FROM base WHERE doc_id % 3 = 0), " +
        "c2 AS (SELECT doc_id + 2000000 AS doc_id, cluster, 'xx' AS lang, " +
        "n_chars FROM base WHERE doc_id % 5 = 0), " +
        "mem AS (SELECT * FROM base UNION ALL SELECT * FROM c1 " +
        "UNION ALL SELECT * FROM c2), " +
        "votes AS (SELECT cluster, lang, count(*) AS n FROM mem " +
        "WHERE lang IS NOT NULL GROUP BY 1, 2), " +
        "el AS (SELECT cluster, lang AS mode_lang FROM (SELECT cluster, lang, " +
        "row_number() OVER (PARTITION BY cluster ORDER BY n DESC, lang) AS rn " +
        "FROM votes) WHERE rn = 1), " +
        "g AS (SELECT cluster, count(*) AS n_members, min(doc_id) AS min_doc_id, " +
        "max(n_chars) AS max_n_chars FROM mem GROUP BY 1) " +
        "SELECT g.cluster, g.n_members, g.min_doc_id, g.max_n_chars, el.mode_lang " +
        "FROM g LEFT JOIN el USING (cluster) ORDER BY cluster"),
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), md5(substring(col("text"), 1, 40)).as("cluster"),
            col("lang"), col("n_chars"))
        val c1 = base.filter(pmod(col("doc_id"), lit(3L)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("cluster"),
            col("lang"), (col("n_chars") + 7L).as("n_chars"))
        val c2 = base.filter(pmod(col("doc_id"), lit(5L)) === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("cluster"),
            lit("xx").as("lang"), col("n_chars"))
        val mem = base.unionByName(c1).unionByName(c2)
        Stats.survivorship(mem, "cluster", modeCols = Seq("lang"),
            minCols = Seq("doc_id"), maxCols = Seq("n_chars"))
          .select(col("cluster"), col("n_members"),
            col("min_doc_id").as("min_doc_id"),
            col("max_n_chars").as("max_n_chars"), col("mode_lang"))
          .orderBy("cluster")
      }),

    // ---- point-in-time SCD-2 lookup: each purchase joins the user's
    // non-purchase state version whose validity interval contains it —
    // equi join on the entity key, interval test as a residual (never a
    // blind range join); SCD intervals are disjoint so matches are unique.
    Q("q193_scd2_join",
      Some("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us " +
        "FROM events WHERE event_type <> 'purchase'), " +
        "w AS (SELECT *, lag(event_type) OVER win AS pa, lag(us) OVER win AS pu " +
        "FROM e WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id)), " +
        "c AS (SELECT *, CASE WHEN pu IS NULL THEN 1 " +
        "WHEN event_type IS NOT DISTINCT FROM pa THEN 0 ELSE 1 END AS chg FROM w), " +
        "r AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id " +
        "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version " +
        "FROM c), " +
        "s AS (SELECT user_id, event_type, us AS valid_from, version FROM r " +
        "WHERE chg = 1), " +
        "f AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id " +
        "ORDER BY version) AS valid_to FROM s), " +
        "p AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events " +
        "WHERE event_type = 'purchase') " +
        "SELECT p.event_id, p.user_id, f.event_type AS state, f.version " +
        "FROM p JOIN f ON p.user_id = f.user_id AND p.us >= f.valid_from " +
        "AND (f.valid_to IS NULL OR p.us < f.valid_to) ORDER BY p.event_id"),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val dim = EventAnalytics.scdHistory(
          ev.filter(col("event_type") =!= "purchase"),
          "user_id", "event_id", "ts", "event_type")
        val facts = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("f_user"), col("ts"))
        EventAnalytics.scdLookup(facts, "f_user",
            EventAnalytics.micros(col("ts")), dim, "user_id")
          .select(col("event_id"), col("f_user").as("user_id"),
            col("event_type").as("state"), col("version"))
          .orderBy("event_id")
      }),

    // ---- PQ ADC top-k search: queries probe the q184 code relation with a
    // broadcast per-query distance LUT; decimal-summed subspace distances
    // make the ranking engine-exact. The PQ story end-to-end: encode
    // (q184) then search without ever touching corpus vectors.
    Q("q194_pq_search",
      Some {
        val values = Similarity.pqCodebooks(nSub = 4, subDim = 16, k = 8)
          .map { case (m, c, v) =>
            s"($m, $c, [${v.mkString(", ")}], ${v.map(x => x * x).sum})"
          }.mkString(", ")
        val sl = "v[m * 16 + 1 : m * 16 + 16]"
        s"WITH cb(m, cid, cv, cn2) AS (VALUES $values), " +
          "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
          "FROM embeddings), " +
          s"dd AS (SELECT vec_id, m AS subspace, cid, list_distance($sl, cv) AS dist " +
          "FROM e CROSS JOIN cb), " +
          "codes AS (SELECT vec_id, subspace, cid AS code FROM " +
          "(SELECT vec_id, subspace, cid, row_number() OVER " +
          "(PARTITION BY vec_id, subspace ORDER BY dist, cid) AS rn FROM dd) " +
          "WHERE rn = 1), " +
          "q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
          "FROM embeddings WHERE vec_id < 8), " +
          s"lut AS (SELECT qid, m AS subspace, cid AS code, " +
          s"CAST((list_dot_product($sl, $sl) - 2 * list_dot_product($sl, cv)) + cn2 " +
          "AS DECIMAL(28,12)) AS d FROM q CROSS JOIN cb), " +
          "adc AS (SELECT lut.qid, codes.vec_id AS nn_id, sum(d) AS dist " +
          "FROM codes JOIN lut USING (subspace, code) " +
          "WHERE codes.vec_id <> lut.qid GROUP BY 1, 2), " +
          "r AS (SELECT qid, nn_id, row_number() OVER (PARTITION BY qid " +
          "ORDER BY dist, nn_id) AS rank FROM adc) " +
          // CAST rank to INTEGER: dtype parity, cf. q185 note
          "SELECT qid, nn_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 5 ORDER BY qid, rank"
      },
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.pqSearchTopK(emb, queries, nSub = 4, subDim = 16, k = 8,
            topK = 5)
          .orderBy("qid", "rank")
      }),

    // ---- per-user daily snapshot with carry-forward: each (user, day)
    // reports the last observed event value on or before that day — the
    // feature-store "as-of daily" materialization; silence carries state.
    Q("q195_carry_forward",
      Some("WITH o AS (SELECT user_id AS key, epoch_us(ts) // 86400000000 AS day, " +
        "value, row_number() OVER (PARTITION BY user_id, " +
        "epoch_us(ts) // 86400000000 ORDER BY epoch_us(ts) DESC, event_id DESC) " +
        "AS rn FROM events), " +
        "ob AS (SELECT key, day, value FROM o WHERE rn = 1), " +
        "lo AS (SELECT key, min(day) AS klo FROM ob GROUP BY 1), " +
        "hi AS (SELECT max(day) AS khi FROM ob), " +
        "sp AS (SELECT key, unnest(range(klo, khi + 1)) AS day FROM lo, hi), " +
        "j AS (SELECT sp.key, sp.day, ob.value FROM sp LEFT JOIN ob USING (key, day)) " +
        "SELECT key, day, last_value(value IGNORE NULLS) OVER " +
        "(PARTITION BY key ORDER BY day ROWS UNBOUNDED PRECEDING) AS value " +
        "FROM j ORDER BY key, day"),
      (s, dir) => EventAnalytics.dailySnapshotFfill(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value")
        .orderBy("key", "day")),

    // ---- explicit GROUPING SETS revenue: (nation), (segment), (nation,
    // segment) in ONE pass with partial aggregation — the report-cube shape
    // between q42's rollup and q92's cube; grouping_id disambiguates rolled
    // nulls, revenue decimal-exact.
    Q("q196_grouping_sets",
      Some("SELECT n_name, c_mktsegment, " +
        "CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid, " +
        "count(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue " +
        "FROM orders JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation ON n_nationkey = c_nationkey " +
        "GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment)) " +
        "ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST"),
      (s, dir) => Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("c_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name")), Seq(col("c_mktsegment")),
            Seq(col("n_name"), col("c_mktsegment"))),
          col("n_name"), col("c_mktsegment"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
            .cast("double").as("revenue"))
        .select(col("n_name"), col("c_mktsegment"), col("gid"),
          col("n_orders"), col("revenue"))
        .orderBy(col("gid"), col("n_name").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first)),

    // ---- weighted lower median: the price below which half the QUANTITY
    // traded, per return flag — integer crossing test over collapsed
    // per-value weights, engine-exact with no interpolation.
    Q("q197_weighted_median",
      Some("WITH pv AS (SELECT l_returnflag, l_extendedprice AS v, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w FROM lineitem " +
        "GROUP BY 1, 2), " +
        "c AS (SELECT l_returnflag, v, w, " +
        "CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY v " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw, " +
        "CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw FROM pv) " +
        "SELECT l_returnflag, v AS weighted_median, tw AS total_weight " +
        "FROM c WHERE cw * 2 >= tw + 1 AND (cw - w) * 2 < tw + 1 " +
        "ORDER BY l_returnflag"),
      (s, dir) => Stats.weightedLowerMedian(Tables.lineitem(s, dir),
          Seq("l_returnflag"), "l_extendedprice", "l_quantity")
        .select(col("l_returnflag"), col("weighted_median"), col("total_weight"))
        .orderBy("l_returnflag")),

    // ---- activity-gap report: per user, silent runs of >= 2 days between
    // active days — the freshness audit over DISTINCT active days, all
    // integer day arithmetic (2-day floor: the densest sf0.001 traffic
    // still produces gaps).
    Q("q201_gap_report",
      Some("WITH a AS (SELECT DISTINCT user_id AS key, " +
        "epoch_us(ts) // 86400000000 AS d FROM events), " +
        "l AS (SELECT key, d, lag(d) OVER (PARTITION BY key ORDER BY d) AS pd " +
        "FROM a) " +
        "SELECT key, pd + 1 AS gap_start, d - 1 AS gap_end, " +
        "d - pd - 1 AS gap_days FROM l WHERE pd IS NOT NULL AND d - pd - 1 >= 2 " +
        "ORDER BY key, gap_start"),
      (s, dir) => EventAnalytics.activityGaps(Tables.events(s, dir),
          "user_id", "ts", minGapDays = 2)
        .orderBy("key", "gap_start")),

    // ---- Markov next-event backtest: modal-successor model trained before
    // the split day, scored after it — integer counts, deterministic
    // elections, one division per row of the type-bounded report.
    Q("q202_markov_backtest",
      Some("WITH e AS (SELECT user_id, event_id, event_type AS nx, " +
        "epoch_us(ts) AS us FROM events), " +
        "p AS (SELECT user_id, us, nx, lag(nx) OVER (PARTITION BY user_id " +
        "ORDER BY us, event_id) AS pv FROM e), " +
        "pairs AS (SELECT * FROM p WHERE pv IS NOT NULL), " +
        "tr AS (SELECT pv, nx, count(*) AS n FROM pairs " +
        "WHERE us < 1705363200000000 GROUP BY 1, 2), " +
        "model AS (SELECT pv, nx AS predicted FROM (SELECT pv, nx, " +
        "row_number() OVER (PARTITION BY pv ORDER BY n DESC, nx) AS rn FROM tr) " +
        "WHERE rn = 1) " +
        "SELECT pv AS prev_type, predicted, count(*) AS n_test, " +
        "CAST(sum(CASE WHEN nx = predicted THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_correct, " +
        "round(CAST(sum(CASE WHEN nx = predicted THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ count(*), 6) AS accuracy " +
        "FROM pairs JOIN model USING (pv) WHERE us >= 1705363200000000 " +
        "GROUP BY 1, 2 ORDER BY 1"),
      (s, dir) => EventAnalytics.markovBacktest(Tables.events(s, dir),
          "user_id", "event_id", "ts", "event_type",
          splitUs = 1705363200000000L) // 2024-01-16 UTC
        .orderBy("prev_type")),

    // ---- linear multi-touch attribution: each purchase's value splits
    // equally across the touches since the user's previous purchase —
    // reversed frame walk for assignment, 6dp-rounded credits summed as
    // DECIMAL (exact rollup).
    Q("q203_linear_attribution",
      Some("WITH e AS (SELECT user_id, event_id, event_type, value, " +
        "epoch_us(ts) AS us FROM events), " +
        "t AS (SELECT *, min(CASE WHEN event_type = 'purchase' THEN event_id END) " +
        "OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_id FROM e), " +
        "tou AS (SELECT * FROM t WHERE event_type <> 'purchase' " +
        "AND conv_id IS NOT NULL), " +
        "pc AS (SELECT conv_id, count(*) AS n FROM tou GROUP BY 1), " +
        "cv AS (SELECT event_id AS conv_id, value AS v FROM e " +
        "WHERE event_type = 'purchase'), " +
        "cr AS (SELECT tou.event_type AS touch_type, " +
        "CAST(round(cv.v / pc.n, 6) AS DECIMAL(18,6)) AS credit " +
        "FROM tou JOIN pc USING (conv_id) JOIN cv USING (conv_id)) " +
        "SELECT touch_type, count(*) AS n_touches, " +
        "CAST(sum(credit) AS DOUBLE) AS total_credit FROM cr " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => EventAnalytics.linearAttribution(Tables.events(s, dir),
          "user_id", "event_id", "ts", "event_type", "purchase", "value")
        .orderBy("touch_type")),

    // ---- incremental aggregation: two shard partials merge to EXACTLY the
    // direct aggregate (decimal state is order-independent) — the oracle IS
    // the direct aggregate, so the hash match proves merge ≡ recompute.
    Q("q205_partial_merge",
      Some("SELECT l_returnflag, count(l_quantity) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total, " +
        "min(l_quantity) AS mn, max(l_quantity) AS mx " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val shards = Seq(0, 1).map(i => Ops.partialAggregate(
          li.filter(pmod(col("l_linenumber"), lit(2)) === i),
          Seq("l_returnflag"), "l_quantity"))
        Ops.mergePartialAggregates(shards, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n"),
            col("sum_dec").cast("double").as("total"),
            col("mn"), col("mx"))
          .orderBy("l_returnflag")
      }),

    // ---- CDC apply: deterministically planted update/delete log against
    // the customer snapshot; latest instruction per key wins, deletes drop.
    Q("q206_cdc_apply",
      Some("SELECT c_custkey, c_name, CASE WHEN c_custkey % 7 = 0 " +
        "THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal " +
        "FROM customer WHERE c_custkey % 11 <> 0 ORDER BY c_custkey"),
      (s, dir) => {
        val base = Tables.customer(s, dir)
          .select("c_custkey", "c_name", "c_acctbal")
        val ups = base.filter(pmod(col("c_custkey"), lit(7L)) === 0)
          .select(col("c_custkey"), col("c_name"),
            (col("c_acctbal") + 100.0).as("c_acctbal"),
            lit(1L).as("version"), lit("U").as("op"))
        val dels = base.filter(pmod(col("c_custkey"), lit(11L)) === 0)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            lit(2L).as("version"), lit("D").as("op"))
        Ops.cdcApply(base, ups.unionByName(dels), "c_custkey", "version", "op")
          .orderBy("c_custkey")
      }),

    // ---- hierarchical contribution: nation revenue share within region,
    // region share of total — ratio-to-report windows over the BOUNDED
    // 25-row child relation, never the fact table.
    Q("q207_share_of_parent",
      Some("WITH ch AS (SELECT r_name, n_name, " +
        "sum(CAST(o_totalprice AS DECIMAL(28,6))) AS v FROM orders " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation ON n_nationkey = c_nationkey " +
        "JOIN region ON r_regionkey = n_regionkey GROUP BY 1, 2), " +
        "w AS (SELECT r_name, n_name, v, sum(v) OVER (PARTITION BY r_name) " +
        "AS pv, sum(v) OVER () AS tv FROM ch) " +
        "SELECT r_name, n_name, CAST(v AS DOUBLE) AS value, " +
        "round(CAST(v AS DOUBLE) / CAST(pv AS DOUBLE), 6) AS share_of_parent, " +
        "round(CAST(pv AS DOUBLE) / CAST(tv AS DOUBLE), 6) AS parent_share_of_total " +
        "FROM w ORDER BY 1, 2"),
      (s, dir) => Stats.ratioToParent(
          Tables.orders(s, dir)
            .join(broadcast(Tables.customer(s, dir)),
              col("c_custkey") === col("o_custkey"))
            .join(broadcast(Tables.nation(s, dir)),
              col("n_nationkey") === col("c_nationkey"))
            .join(broadcast(Tables.region(s, dir)),
              col("r_regionkey") === col("n_regionkey")),
          Seq("r_name"), Seq("n_name"), "o_totalprice")
        .orderBy("r_name", "n_name"))
 ,

    // ---- within-label embedding diversity WITHOUT the O(n²) pair join:
    // mean pairwise cosine via the unit-vector identity
    // (‖Σu‖² − n)/(n(n−1)) — one (label, dim) decimal-exact rollup.
    Q("q340_group_diversity",
      Some("WITH x AS (SELECT label, vec_id, unnest(embedding) AS v0, " +
        "unnest(range(1, len(embedding) + 1)) AS i FROM embeddings), " +
        "e AS (SELECT vec_id, label, i, CAST(v0 AS DOUBLE) AS v FROM x), " +
        "n2 AS (SELECT vec_id, label, CAST(SUM(CAST(v * v AS " +
        "DECIMAL(38,12))) AS DOUBLE) AS n2 FROM e GROUP BY 1, 2 " +
        "HAVING CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) > 0), " +
        "us AS (SELECT e.label, e.i, CAST(SUM(CAST(e.v / sqrt(n2.n2) " +
        "AS DECIMAL(38,12))) AS DOUBLE) AS s FROM e JOIN n2 " +
        "ON e.vec_id = n2.vec_id AND e.label = n2.label GROUP BY 1, 2), " +
        "s2 AS (SELECT label, CAST(SUM(CAST(s * s AS DECIMAL(38,12))) " +
        "AS DOUBLE) AS s2 FROM us GROUP BY 1), " +
        "n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM n2 " +
        "GROUP BY 1) " +
        "SELECT n.label AS \"group\", n.n, CASE WHEN n.n > 1 THEN " +
        "round((s2.s2 - CAST(n.n AS DOUBLE)) / (CAST(n.n AS DOUBLE) * " +
        "CAST(n.n - 1 AS DOUBLE)), 6) END AS mean_cos " +
        "FROM n JOIN s2 ON n.label = s2.label ORDER BY 1"),
      (s, dir) => Similarity.groupDiversity(Tables.embeddings(s, dir),
          "vec_id", "label", "embedding")
        .orderBy("group"))
 ,

    // ---- per-dimension z-standardization of the embedding corpus in
    // long form: DECIMAL(38,12) moment sums, one mirrored IEEE z shape;
    // output bounded to a vec_id slice to keep the gate tight.
    Q("q353_standardize_embeddings",
      Some("WITH x AS (SELECT vec_id AS id, unnest(embedding) AS v0, " +
        "unnest(range(1, len(embedding) + 1)) AS dim FROM embeddings), " +
        "e AS (SELECT id, dim, CAST(v0 AS DOUBLE) AS v FROM x), " +
        "m AS (SELECT dim, count(*) AS n, " +
        "CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) AS s1, " +
        "CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS s2 " +
        "FROM e GROUP BY 1), " +
        "mv AS (SELECT dim, s1 / CAST(n AS DOUBLE) AS mu, " +
        "s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * " +
        "(s1 / CAST(n AS DOUBLE)) AS var FROM m) " +
        // CAST dim to INTEGER: Spark posexplode ordinal is int
        "SELECT id, CAST(e.dim AS INTEGER) AS dim, CASE WHEN var > 0 THEN " +
        "round((v - mu) / sqrt(var), 6) END AS z " +
        "FROM e JOIN mv ON e.dim = mv.dim WHERE id % 25 = 0 " +
        "ORDER BY id, e.dim"),
      (s, dir) => Similarity.standardizeEmbeddings(
          Tables.embeddings(s, dir), "vec_id", "embedding")
        .filter(pmod(col("id"), lit(25)) === 0)
        .orderBy("id", "dim")),

    // ---- anisotropy report: per-dim centered variances feed the
    // participation ratio (Σλ)²/Σλ² — the rogue-dimension check without
    // an SVD; deterministic top-dim election.
    Q("q354_participation_ratio",
      Some("WITH x AS (SELECT unnest(embedding) AS v0, " +
        "unnest(range(1, len(embedding) + 1)) AS dim FROM embeddings), " +
        "e AS (SELECT dim, CAST(v0 AS DOUBLE) AS v FROM x), " +
        "m AS (SELECT dim, count(*) AS n, " +
        "CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) AS s1, " +
        "CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS s2 " +
        "FROM e GROUP BY 1), " +
        "lam AS (SELECT dim, s2 / CAST(n AS DOUBLE) - " +
        "(s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS l FROM m), " +
        "top AS (SELECT dim AS top_dim, l AS tl FROM lam " +
        "ORDER BY l DESC, dim LIMIT 1), " +
        "agg AS (SELECT count(*) AS n_dims, " +
        "CAST(sum(CAST(l AS DECIMAL(28,12))) AS DOUBLE) AS sl, " +
        "CAST(sum(CAST(l * l AS DECIMAL(28,12))) AS DOUBLE) AS sl2 " +
        "FROM lam) " +
        "SELECT n_dims, round(sl, 6) AS total_var, " +
        "CASE WHEN sl2 > 0 THEN round(sl * sl / sl2, 6) END " +
        "AS participation_ratio, CAST(top_dim AS INTEGER) AS top_dim, " +
        "CASE WHEN sl > 0 THEN round(tl / sl, 6) END AS top_dim_share " +
        "FROM agg, top"),
      (s, dir) => Similarity.participationRatio(
        Tables.embeddings(s, dir), "embedding"))
  )
}
