package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ops
import graft.pipeline.{Curation, Dedup, TextAnalysis => TA}

/** Text-analysis + dedup queries over the `documents` table (training-data
  * pipeline operators; SURVEY.md north-star uplift).
  */
object TextQueries {

  // DuckDB fragments mirrored against the Scala expressions
  private val tokensSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val ltokensSql = """regexp_split_to_array(trim(lower(text)), '\s+')"""
  private val normSql = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
  private val stopList = TA.Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  // quality-score CTE mirrored against TA.qualityScore — shared by q25
  // (per-doc scores) and q65 (corpus-relative quantile gate)
  private def qualityCte(src: String) =
    s"WITH m AS (SELECT doc_id, " +
      s"CAST(len($tokensSql) AS DOUBLE) AS nt, " +
      "CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio, " +
      s"CAST(len(list_filter($ltokensSql, x -> x IN $stopList)) AS DOUBLE) / len($ltokensSql) AS stop_ratio, " +
      s"CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len($tokensSql) AS mtl " +
      s"FROM $src), " +
      "sc AS (SELECT doc_id, round(stop_ratio, 6) AS stop_ratio, " +
      "round(least(nt / 50.0, 1.0) * 0.3 + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 + " +
      "least(stop_ratio * 5.0, 1.0) * 0.3 + (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality " +
      "FROM m) "

  // 3-gram shingle list + lexicographic-min blocking key (1-function MinHash)
  private val shinglesSql =
    s"""CASE WHEN len($ltokensSql) < 3 THEN [array_to_string($ltokensSql, ' ')]
       | ELSE list_distinct([array_to_string($ltokensSql[i:i+2], ' ')
       |   for i in range(1, len($ltokensSql) - 1)]) END""".stripMargin.replaceAll("\n", " ")

  val qs: Seq[Q] = Seq(

    // ---- corpus-relative TF-IDF top terms: idf is the RATIONAL inverse
    // document frequency (N+1)/(df+1) — log-free on purpose, so the score
    // is bit-identical across engines and the top-k boundary can't flip on
    // an ulp (see TextAnalysis.tfidfTopTerms). Ties break to the smaller
    // term in both window orders.
    Q("q60_tfidf",
      Some(s"WITH tk AS (SELECT doc_id, unnest($ltokensSql) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2), " +
        "dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents), " +
        "s AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, " +
        "tf.tf * (nd.n_docs + 1.0) / (dfreq.df + 1.0) AS score " +
        "FROM tf JOIN dfreq USING (term), nd), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk FROM s) " +
        // CAST to INTEGER: DuckDB row_number() is BIGINT → pandas int64,
        // Spark row_number() is int — the driver hash is dtype-sensitive
        "SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df, round(score, 6) AS score " +
        "FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk"),
      (s, dir) => TA.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rnk")),

    // ---- char-distribution entropy (perplexity proxy): Spark computes it
    // as a row-local run-length fold over the sorted char array; the oracle
    // re-derives it from per-char counts — same Σ n·ln n up to fp summation
    // order, pinned by the 6-dp round.
    Q("q61_char_entropy",
      Some(s"WITH nrm AS (SELECT doc_id, $normSql AS norm FROM documents), " +
        "ch AS (SELECT doc_id, unnest([norm[i] for i in range(1, length(norm) + 1)]) AS c FROM nrm), " +
        "f AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2), " +
        "t AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS total, sum(n * ln(n)) AS snln FROM f GROUP BY 1) " +
        "SELECT doc_id, total AS n_chars, round(ln(total) - snln / total, 6) AS char_entropy " +
        "FROM t ORDER BY doc_id"),
      (s, dir) => Tables.documents(s, dir).select(col("doc_id"),
          length(TA.normalized(col("text"))).cast("long").as("n_chars"),
          TA.charEntropy(col("text")).as("char_entropy"))
        .orderBy("doc_id")),

    // ---- token counting (whitespace) + char stats.
    Q("q24_token_stats",
      // CAST to INTEGER: DuckDB length/len are BIGINT, Spark's are int —
      // exact dtype parity, cf. q60 note
      Some("SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, " +
        s"CAST(len($tokensSql) AS INTEGER) AS n_tokens, " +
        s"round(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len($tokensSql), 6) AS mean_token_len " +
        "FROM documents ORDER BY doc_id"),
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TA.charCount(col("text")).as("n_chars"),
        TA.tokenCount(col("text")).as("n_tokens"),
        round(TA.meanTokenLen(col("text")), 6).as("mean_token_len"))
        .orderBy("doc_id")),

    // ---- quality scoring: length/punct/stopword components, same formula
    // in both engines.
    Q("q25_text_quality",
      Some(qualityCte("documents") +
        "SELECT doc_id, stop_ratio, quality FROM sc ORDER BY doc_id"),
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        round(TA.wordHitRatio(col("text"), TA.Stopwords), 6).as("stop_ratio"),
        TA.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // ---- corpus-relative quantile gate: drop the worst quartile by
    // quality. The exact interpolated p25 (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, both R-7 over the same 6-dp-rounded scores) is one
    // global aggregate broadcast back as a scalar — no corpus sort, no
    // window; the gate itself is row-local.
    Q("q65_quality_gate",
      Some(qualityCte("documents") +
        "SELECT sc.doc_id, sc.quality, round(t.q25, 6) AS threshold " +
        "FROM sc, (SELECT quantile_cont(quality, 0.25) AS q25 FROM sc) t " +
        "WHERE sc.quality >= t.q25 ORDER BY sc.doc_id"),
      (s, dir) => {
        val scored = Tables.documents(s, dir).select(col("doc_id"),
          TA.qualityScore(col("text")).as("quality"))
        TA.aboveQuantile(scored, "quality", 0.25, "__thr")
          .select(col("doc_id"), col("quality"),
            round(col("__thr"), 6).as("threshold"))
          .orderBy("doc_id")
      }),

    // ---- HTML text extraction: both engines wrap the document text in the
    // same deterministic HTML (title/style/script/comment blocks, entities,
    // nested tags) and must strip to the identical visible text. Script and
    // style CONTENT must vanish (not just the tags); entities decode once,
    // &amp; last. All row-local regexp/replace chains.
    Q("q76_html_strip",
      Some("WITH a AS (SELECT doc_id, " +
        "'<html><head><title>Doc ' || doc_id || '</title><style>p { color: red; }</style></head>' || " +
        "'<body><!-- nav bar --><h1>Heading ' || doc_id || '</h1><p>' || " +
        s"array_to_string(($ltokensSql)[1:15], ' ') || ' &amp; more &lt;tags&gt;</p>' || " +
        "'<script>var x = 1; if (x < 2) { x = x + 1; }</script>' || " +
        s"'<p>tail&nbsp;of&nbsp;doc&#39;s &quot;text&quot;</p></body></html>' AS html FROM documents), " +
        "s AS (SELECT doc_id, trim(regexp_replace(" +
        "replace(replace(replace(replace(replace(replace(" +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(html, " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
        "'(?s)<!--.*?-->', ' ', 'g'), " +
        "'<[^>]+>', ' ', 'g'), " +
        "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
        "'&#39;', chr(39)), '&amp;', '&'), " +
        "'\\s+', ' ', 'g')) AS clean FROM a) " +
        // CAST to INTEGER: dtype parity, cf. q60 note
        "SELECT doc_id, clean, CAST(len(regexp_split_to_array(clean, '\\s+')) AS INTEGER) AS n_tokens " +
        "FROM s ORDER BY doc_id"),
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title><style>p { color: red; }</style></head>"),
          lit("<body><!-- nav bar --><h1>Heading "), col("doc_id"), lit("</h1><p>"),
          concat_ws(" ", slice(TA.tokens(lower(col("text"))), 1, 15)),
          lit(" &amp; more &lt;tags&gt;</p>"),
          lit("<script>var x = 1; if (x < 2) { x = x + 1; }</script>"),
          lit("<p>tail&nbsp;of&nbsp;doc&#39;s &quot;text&quot;</p></body></html>"))
        Tables.documents(s, dir)
          .select(col("doc_id"), graft.pipeline.Web.stripTags(html).as("clean"))
          .withColumn("n_tokens", size(split(col("clean"), "\\s+")))
          .orderBy("doc_id")
      }),

    // ---- sentence segmentation (CCNet sentence-dedup prerequisite): both
    // engines build the same multi-sentence paragraph (periods, bangs,
    // questions, an ellipsis), split with the identical RE2 pattern, strip
    // terminal punctuation, and explode with ordinals.
    Q("q77_sentences",
      Some("WITH a AS (SELECT doc_id, " +
        s"coalesce(array_to_string(($ltokensSql)[1:8], ' '), '') || '. ' || " +
        s"coalesce(array_to_string(($ltokensSql)[9:14], ' '), '') || '! Is this rule ' || doc_id % 7 || '? ' || " +
        s"coalesce(array_to_string(($ltokensSql)[15:20], ' '), '') || '... The very end.' AS para FROM documents), " +
        "l AS (SELECT doc_id, list_filter(list_transform(" +
        "regexp_split_to_array(para, '[.!?]+\\s+'), " +
        "x -> trim(regexp_replace(x, '[.!?]+\\s*$', ''))), x -> x != '') AS ss FROM a), " +
        "u AS (SELECT doc_id, unnest(range(len(ss))) AS sentence_id, unnest(ss) AS sentence FROM l) " +
        // CAST to INTEGER: dtype parity, cf. q60 note (posexplode ordinal
        // and size() are both int on the Spark side)
        "SELECT doc_id, CAST(sentence_id AS INTEGER) AS sentence_id, sentence, " +
        "CAST(len(regexp_split_to_array(trim(sentence), '\\s+')) AS INTEGER) AS n_tokens " +
        "FROM u ORDER BY doc_id, sentence_id"),
      (s, dir) => {
        val toks = TA.tokens(lower(col("text")))
        val para = concat(
          concat_ws(" ", slice(toks, 1, 8)), lit(". "),
          concat_ws(" ", slice(toks, 9, 6)), lit("! Is this rule "),
          pmod(col("doc_id"), lit(7)), lit("? "),
          concat_ws(" ", slice(toks, 15, 6)), lit("... The very end."))
        Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(TA.sentences(para)).as(Seq("sentence_id", "sentence")))
          .withColumn("n_tokens", size(split(trim(col("sentence")), "\\s+")))
          .orderBy("doc_id", "sentence_id")
      }),

    // ---- vocabulary with coverage (tokenizer-prep): top-100 tokens by
    // corpus frequency with the cumulative occurrence fraction per rank.
    // One token-keyed combinable aggregate; TakeOrdered cutoff; the rank
    // window runs over exactly topV rows (bounded by the parameter).
    Q("q72_vocabulary",
      Some("WITH tk AS (SELECT unnest(list_filter(" +
        "regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t != '')) AS token FROM documents), " +
        "c AS (SELECT token, count(*) AS n FROM tk GROUP BY 1), " +
        "tot AS (SELECT count(*) AS total FROM tk), " +
        "top AS (SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT 100), " +
        "r AS (SELECT token, n, row_number() OVER (ORDER BY n DESC, token ASC) AS rank, " +
        "sum(n) OVER (ORDER BY n DESC, token ASC ROWS UNBOUNDED PRECEDING) AS cum FROM top) " +
        // CAST to INTEGER: dtype parity, cf. q60 note
        "SELECT CAST(rank AS INTEGER) AS rank, token, n, round(CAST(cum AS DOUBLE) / tot.total, 6) AS coverage " +
        "FROM r, tot ORDER BY rank"),
      (s, dir) => TA.vocabulary(Tables.documents(s, dir), "text", topV = 100)
        .orderBy("rank")),

    // ---- approximate quantile gate, oracle-checked q43-style: the GK /
    // t-digest sketches are engine-specific, so each engine checks its OWN
    // sketch threshold and kept-count against its own exact values, and the
    // within-tolerance BOOLEANS must agree (the exact count and threshold
    // match value-for-value). This is the bounded-memory path for
    // unquantized scores — see TextAnalysis.approxAboveQuantile.
    Q("q69_approx_quantile_gate",
      Some(qualityCte("documents") +
        ", t AS (SELECT quantile_cont(quality, 0.25) AS q25, " +
        "approx_quantile(quality, 0.25) AS qa FROM sc), " +
        "ne AS (SELECT count(*) AS n_exact FROM sc, t WHERE quality >= q25), " +
        "na AS (SELECT count(*) AS n_approx FROM sc, t WHERE quality >= qa) " +
        "SELECT ne.n_exact, round(t.q25, 6) AS threshold, " +
        "abs(t.qa - t.q25) <= greatest(0.10 * t.q25, 0.05) AS approx_thr_ok, " +
        "abs(na.n_approx - ne.n_exact) <= greatest(CAST(floor(0.10 * ne.n_exact) AS BIGINT), 25) AS approx_n_ok " +
        "FROM ne, na, t"),
      (s, dir) => {
        val scored = Tables.documents(s, dir).select(col("doc_id"),
          TA.qualityScore(col("text")).as("quality"))
        val ne = TA.aboveQuantile(scored, "quality", 0.25, "__thr")
          .agg(count(lit(1)).as("n_exact"), first(col("__thr")).as("__q25"))
        val na = TA.approxAboveQuantile(scored, "quality", 0.25, 10000, "__ta")
          .agg(count(lit(1)).as("n_approx"), first(col("__ta")).as("__qa"))
        ne.crossJoin(na).select(
          col("n_exact"),
          round(col("__q25"), 6).as("threshold"),
          (abs(col("__qa") - col("__q25")) <=
            greatest(lit(0.10) * col("__q25"), lit(0.05))).as("approx_thr_ok"),
          (abs(col("n_approx") - col("n_exact")) <=
            greatest(floor(lit(0.10) * col("n_exact")).cast("long"), lit(25L)))
            .as("approx_n_ok"))
      }),

    // ---- exact dedup over a corpus with planted duplicates (documents
    // unioned with an id-shifted copy): group on md5(normalized), keep min id.
    Q("q26_dedup_exact",
      Some("WITH corpus AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents) " +
        s"SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies " +
        "FROM corpus GROUP BY fp ORDER BY keep_id"),
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val corpus = Ops.concat(Seq(d,
          d.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))))
        Dedup.exactDedup(corpus, "doc_id", "text").orderBy("keep_id")
      }),

    // ---- language ID heuristic vs the labeled lang column: the stopword
    // argmax (alphabetical tie-break) is mirrored exactly in SQL.
    Q("q27_langid",
      Some {
        val hitCols = TA.LangProfiles.map { case (lang, words) =>
          val list = words.map(w => s"'$w'").mkString("(", ", ", ")")
          s"len(list_filter($ltokensSql, x -> x IN $list)) AS h_$lang"
        }.mkString(", ")
        val langs = TA.LangProfiles.map(_._1)
        val mx = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
        val pick = langs.map(l => s"WHEN h_$l = __mx THEN '$l'").mkString(" ")
        s"WITH hits AS (SELECT lang, $hitCols FROM documents), " +
          s"m AS (SELECT lang, $mx AS __mx, * FROM hits) " +
          s"SELECT lang, CASE WHEN __mx = 0 THEN 'und' $pick END AS predicted, " +
          "COUNT(*) AS n FROM m GROUP BY lang, predicted ORDER BY lang, predicted"
      },
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), TA.langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")),

    // ---- n-gram Jaccard near-dup with lexicographic-min-shingle blocking
    // (a deterministic 1-hash MinHash LSH, mirrorable in SQL: same blocks,
    // same exact verification in both engines).
    Q("q28_ngram_jaccard",
      Some(s"WITH sh AS (SELECT doc_id, $shinglesSql AS s FROM documents), " +
        "blk AS (SELECT doc_id, s, list_aggregate(s, 'min') AS b FROM sh) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard " +
        "FROM blk a JOIN blk b ON a.b = b.b AND a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.8 " +
        "ORDER BY id_a, id_b"),
      (s, dir) => Dedup.ngramJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text",
        blockCol = array_min(Dedup.wordShingles(col("text"), 3)),
        n = 3, threshold = 0.8).orderBy("id_a", "id_b")),

    // ---- document fingerprints, ORACLE-CHECKED: the md5-nibble-decode
    // discipline (q232) makes every hash engine-replayable — fp_md5 is the
    // exact-dedup md5, simhash_md5 runs the NATIVE SimHash64 fold kernel
    // (the one simhashDedup ships) over 60-bit md5 token hashes so the
    // fold logic itself is oracle-gated (bits 60-63 stay 0: the hash is
    // 60-bit, so every bit-count is -n_tokens), and rolling_fp_md5 is the
    // winnowing min over 16-char-shingle md5 hashes. Production paths keep
    // xxhash64 (codegen'd, engine-pinned; gated by the q359/q360 planted
    // checks) — this query pins the FOLD/MIN structure cross-engine.
    Q("q29_fingerprints", {
      // 60-bit integer from the first 15 md5 nibbles (q232 discipline)
      def dec(hx: String) = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * " +
          s"${BigInt(16).pow(15 - i)}").mkString("(", " + ", ")")
      val bits = (0 until 60).map(b =>
        s"(CASE WHEN sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) " +
          s"> 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      Some("WITH tok AS (SELECT doc_id, " +
        s"unnest($ltokensSql) AS t FROM documents), " +
        "th AS (SELECT doc_id, substr(md5(t), 1, 15) AS hx FROM tok), " +
        s"hh AS (SELECT doc_id, ${dec("hx")} AS h FROM th), " +
        s"sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash_md5 " +
        "FROM hh GROUP BY doc_id), " +
        s"nd AS (SELECT doc_id, $normSql AS s FROM documents), " +
        "rf AS (SELECT doc_id, CAST(list_min(list_transform(" +
        "list_transform(range(1, greatest(length(s) - 15, 1) + 1), " +
        "i -> substr(md5(substr(s, i, 16)), 1, 15)), " +
        s"hx -> ${dec("hx")})) AS BIGINT) AS rolling_fp_md5 FROM nd) " +
        s"SELECT d.doc_id, md5($normSql) AS fp_md5, sh.simhash_md5, " +
        "rf.rolling_fp_md5 FROM documents d " +
        "JOIN sh ON d.doc_id = sh.doc_id JOIN rf ON d.doc_id = rf.doc_id " +
        "ORDER BY d.doc_id")
    },
      (s, dir) => {
        // 60-bit md5 prefixes through the native array kernel (round-15
        // optimization) — the interpreted per-element
        // conv(substring(md5 ...)) transform was the query's whole cost
        val norm = TA.normalized(col("text"))
        Tables.documents(s, dir).select(
          col("doc_id"),
          TA.fingerprint(col("text")).as("fp_md5"),
          graft.functions.SketchExprs.simhash64(
            graft.functions.SketchExprs.md5H60Array(
              split(trim(lower(col("text"))), "\\s+"))).as("simhash_md5"),
          array_min(graft.functions.SketchExprs.md5H60Array(transform(
            sequence(lit(1), greatest(length(norm) - 15, lit(1))),
            i => norm.substr(i, lit(16))))).as("rolling_fp_md5"))
          .orderBy("doc_id")
      }),

    // ---- pair resolution: the q28 edge set resolved into connected
    // components (cluster = min reachable id, is_keep = canonical doc).
    // Oracle mirrors the label semantics with a recursive transitive
    // closure — an oracle-checked distributed graph fixed point.
    Q("q48_dedup_clusters",
      Some(s"WITH RECURSIVE sh AS (SELECT doc_id, $shinglesSql AS s FROM documents), " +
        "blk AS (SELECT doc_id, s, list_aggregate(s, 'min') AS b FROM sh), " +
        "edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM blk a JOIN blk b ON a.b = b.b AND a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.8), " +
        "und AS (SELECT id_a AS src, id_b AS dst FROM edges UNION SELECT id_b, id_a FROM edges), " +
        "reach AS (SELECT src, dst FROM und " +
        "UNION SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src) " +
        "SELECT src AS id, LEAST(src, MIN(dst)) AS cluster, " +
        "src = LEAST(src, MIN(dst)) AS is_keep FROM reach GROUP BY src ORDER BY id"),
      (s, dir) => {
        val edges = Dedup.ngramJaccardPairs(
          Tables.documents(s, dir), "doc_id", "text",
          blockCol = array_min(Dedup.wordShingles(col("text"), 3)),
          n = 3, threshold = 0.8)
        Dedup.connectedComponents(edges)
          .select(col("id"), col("cluster"), col("is_keep"))
          .orderBy("id")
      }),

    // ---- keep-best-per-cluster: q48's clusters, but the keep election
    // picks the highest-score member (token count; ties -> lowest id) —
    // the production retention rule. Oracle = same recursive-CTE reachability
    // plus a first_value window for the argmax.
    Q("q82_keep_best",
      Some(s"WITH RECURSIVE sh AS (SELECT doc_id, $shinglesSql AS s FROM documents), " +
        "blk AS (SELECT doc_id, s, list_aggregate(s, 'min') AS b FROM sh), " +
        "edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM blk a JOIN blk b ON a.b = b.b AND a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.8), " +
        "und AS (SELECT id_a AS src, id_b AS dst FROM edges UNION SELECT id_b, id_a FROM edges), " +
        "reach AS (SELECT src, dst FROM und " +
        "UNION SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src), " +
        "lab AS (SELECT src AS id, LEAST(src, MIN(dst)) AS cluster FROM reach GROUP BY src), " +
        s"sc AS (SELECT doc_id, CAST(len($tokensSql) AS DOUBLE) AS score FROM documents) " +
        "SELECT lab.id, lab.cluster, sc.score, " +
        "first_value(lab.id) OVER w AS keep_id, " +
        "lab.id = first_value(lab.id) OVER w AS is_keep " +
        "FROM lab JOIN sc ON lab.id = sc.doc_id " +
        "WINDOW w AS (PARTITION BY lab.cluster ORDER BY sc.score DESC, lab.id ASC) " +
        "ORDER BY id"),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          blockCol = array_min(Dedup.wordShingles(col("text"), 3)),
          n = 3, threshold = 0.8)
        Dedup.keepBestPerCluster(edges,
            docs.select(col("doc_id"), TA.tokenCount(col("text")).as("score")),
            "doc_id", "score")
          .orderBy("id")
      }),

    // ---- unicode canonicalization: both engines build the same augmented
    // text (the word-soup corpus is pure ASCII, so a deterministic
    // doc_id-keyed suffix supplies combining sequences, precomposed
    // accents, and a plain-ASCII fast-path case), then NFC-normalize and
    // accent-fold. DuckDB's nfc_normalize/strip_accents are the
    // independent implementations of the same Unicode standard forms.
    Q("q83_unicode_normalize", {
      // combining sequences (e+U+0301, o+U+0308) that NFC must compose,
      // precomposed accents that strip_accents must fold, and an
      // all-ASCII fast-path variant; the same Scala string (so the same
      // bytes) feeds both engines' literals
      val suffix0 = " cafe\u0301 ole\u0301 statio\u0308n"
      val suffix1 = " na\u00efve \u00c5ngstro\u0308m fa\u00e7ade"
      val suffix2 = " plain ascii tail"
      val caseSql = "text || CASE CAST(doc_id % 3 AS INT) " +
        s"WHEN 0 THEN '$suffix0' WHEN 1 THEN '$suffix1' ELSE '$suffix2' END"
      Some("SELECT doc_id, " +
        s"nfc_normalize($caseSql) AS nfc, " +
        s"strip_accents(nfc_normalize($caseSql)) AS plain " +
        "FROM documents ORDER BY doc_id")
    },
      (s, dir) => {
        import graft.functions.UnicodeFns
        val aug = concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(" cafe\u0301 ole\u0301 statio\u0308n"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(" na\u00efve \u00c5ngstro\u0308m fa\u00e7ade"))
            .otherwise(lit(" plain ascii tail")))
        Tables.documents(s, dir).select(
            col("doc_id"),
            UnicodeFns.unicodeNormalize(aug, "NFC").as("nfc"),
            UnicodeFns.stripAccents(UnicodeFns.unicodeNormalize(aug, "NFC")).as("plain"))
          .orderBy("doc_id")
      }),

    // ---- the SQL-expressible slice of q29: md5 over the same normalized
    // form is engine-independent, so this one IS oracle-checked (the
    // xxhash-based simhash/rolling columns stay rows-only in q29).
    Q("q46_fingerprint_md5",
      Some(s"SELECT doc_id, md5($normSql) AS fp_md5 FROM documents ORDER BY doc_id"),
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TA.fingerprint(col("text")).as("fp_md5"))
        .orderBy("doc_id")),

    // ---- MinHash + LSH near-dup (64 hashes, 16 bands), ORACLE-CHECKED
    // end to end: md5-seeded mode (the q371 salted-min signature + q232
    // nibble decode) makes every stage engine-replayable, so the oracle
    // reproduces the FULL banded pipeline — distinct-set collapse (rid =
    // min id per sorted shingle set), 64 salted md5 minima, 16 band
    // buckets = md5 of the JSON slice rendering, the maxBucket-capped +
    // successor-chained candidate join, exact-Jaccard verification, and
    // both expansions. Production config keeps xxhash64 (q70's planted
    // gate); THIS query gates the pipeline STRUCTURE cross-engine.
    Q("q30_minhash_neardup", {
      def dec(hx: String) = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * " +
          s"${BigInt(16).pow(15 - i)}").mkString("(", " + ", ")")
      val sigCols = (0 until 64).map(i =>
        "CAST(list_min(list_transform(list_transform(k, " +
          s"g -> substr(md5('mh$i|' || g), 1, 15)), " +
          s"hx -> ${dec("hx")})) AS BIGINT) AS m$i").mkString(", ")
      val bandStructs = (0 until 16).map { b =>
        val ms = (0 until 4).map(r => s"m${b * 4 + r}")
        s"{'band': $b, 'bucket': md5('[' || " +
          ms.mkString(" || ',' || ") + " || ']')}"
      }.mkString(", ")
      Some(s"WITH sh AS (SELECT doc_id, list_sort($shinglesSql) AS k " +
        "FROM documents), " +
        "reps AS (SELECT k, min(doc_id) AS rid FROM sh GROUP BY k), " +
        s"sig AS (SELECT k, rid, $sigCols FROM reps), " +
        s"banded AS (SELECT k, rid, unnest([$bandStructs], " +
        "recursive := true) FROM sig), " +
        "ranked AS (SELECT k, rid, band, bucket, row_number() OVER " +
        "(PARTITION BY band, bucket ORDER BY rid) AS rn FROM banded), " +
        "cand AS (SELECT DISTINCT a.k AS ka, b.k AS kb " +
        "FROM ranked a JOIN ranked b ON a.band = b.band " +
        "AND a.bucket = b.bucket AND " +
        "((a.rn < b.rn AND b.rn <= 4096) OR b.rn = a.rn + 1)), " +
        "ver AS (SELECT ka, kb, " +
        "CAST(len(list_intersect(ka, kb)) AS DOUBLE) / " +
        "len(list_distinct(ka || kb)) AS j FROM cand) " +
        "SELECT least(x.doc_id, y.doc_id) AS id_a, " +
        "greatest(x.doc_id, y.doc_id) AS id_b, round(j, 6) AS jaccard " +
        "FROM ver JOIN sh x ON x.k = ver.ka JOIN sh y ON y.k = ver.kb " +
        "WHERE j >= 0.8 " +
        "UNION ALL SELECT x.doc_id, y.doc_id, CAST(1.0 AS DOUBLE) " +
        "FROM sh x JOIN sh y ON x.k = y.k AND x.doc_id < y.doc_id " +
        "ORDER BY id_a, id_b")
    },
      (s, dir) => Dedup.minhashDedup(Tables.documents(s, dir), "doc_id", "text",
        Dedup.MinHashConfig(numHashes = 64, bands = 16, shingleN = 3,
          threshold = 0.8, md5Seeded = true))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // ---- the LSH pipeline proven end-to-end against GROUND TRUTH: the
    // corpus (documents + planted near-identical copies: doc_id%3==0
    // re-appears at id+1e6, uppercased + double-spaced + one appended
    // token, so normalization AND shingling are both exercised) runs the
    // full MinHash path — shingle → signature → band → candidate → exact-
    // Jaccard verify — while the oracle computes the COMPLETE true pair
    // set at J >= 0.9 by exact all-pairs Jaccard. The join is pruned by
    // the size bound (J >= 0.9 forces 10·|A| >= 9·|B| both ways — integer
    // arithmetic, no float boundary), which drops no true pair. Hash
    // equality = the banded pipeline recovered EVERY true pair (natural
    // ones included — the corpus has them) with the exact verified scores,
    // not just recall-spec'd candidates.
    Q("q70_lsh_verified_pairs",
      Some("WITH corpus AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, upper(text) || '  zzzuniquetail' " +
        "FROM documents WHERE doc_id % 3 = 0), " +
        "t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM corpus), " +
        "sh AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')] " +
        "ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) END AS s FROM t), " +
        "sz AS (SELECT doc_id, s, len(s) AS ns FROM sh) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)), 6) AS jaccard " +
        "FROM sz a JOIN sz b ON a.doc_id < b.doc_id " +
        "AND a.ns * 10 >= b.ns * 9 AND b.ns * 10 >= a.ns * 9 " +
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) >= 0.9 " +
        "ORDER BY id_a, id_b"),
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val planted = d.union(d.filter(pmod(col("doc_id"), lit(3)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            concat(upper(col("text")), lit("  zzzuniquetail")).as("text")))
        Dedup.minhashDedup(planted, "doc_id", "text",
            Dedup.MinHashConfig(numHashes = 64, bands = 16, shingleN = 3,
              threshold = 0.9))
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      }),

    // ---- cross-corpus fuzzy decontamination, q70-style ground truth: the
    // reference set holds near-identical variants (%5 docs, uppercased +
    // appended token) and verbatim copies (%9 docs, shifted ids) of corpus
    // docs; the full MinHash path must recover EVERY cross-side pair at
    // J >= 0.9 that the oracle's exact all-cross-pairs Jaccard (size-bound
    // pruned, lossless) computes — natural matches included.
    Q("q81_cross_corpus_decontam", {
      val sh = shinglesSql
      Some("WITH refs AS (SELECT doc_id AS ref_id, upper(text) || ' zzztail' AS text " +
        "FROM documents WHERE doc_id % 5 = 0 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 9 = 0), " +
        s"ca0 AS (SELECT doc_id, $sh AS s FROM documents), " +
        s"cb0 AS (SELECT ref_id, $sh AS s FROM refs), " +
        "ca AS (SELECT doc_id, s, len(s) AS ns FROM ca0), " +
        "cb AS (SELECT ref_id, s, len(s) AS ns FROM cb0) " +
        "SELECT ca.doc_id AS corpus_id, cb.ref_id, " +
        "round(CAST(len(list_intersect(ca.s, cb.s)) AS DOUBLE) / len(list_distinct(ca.s || cb.s)), 6) AS jaccard " +
        "FROM ca JOIN cb ON ca.ns * 10 >= cb.ns * 9 AND cb.ns * 10 >= ca.ns * 9 " +
        "WHERE CAST(len(list_intersect(ca.s, cb.s)) AS DOUBLE) / len(list_distinct(ca.s || cb.s)) >= 0.9 " +
        "ORDER BY corpus_id, ref_id")
    },
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val refs = d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select(col("doc_id"), concat(upper(col("text")), lit(" zzztail")).as("text"))
          .union(d.filter(pmod(col("doc_id"), lit(9)) === 0)
            .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
        Dedup.crossCorpusNearDups(d, refs, "doc_id", "text",
            Dedup.MinHashConfig(numHashes = 64, bands = 16, shingleN = 3,
              threshold = 0.9))
          .select(col("corpus_id"), col("ref_id"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("corpus_id", "ref_id")
      }),

    // ---- SimHash near-dup via 16-bit band LSH + hamming verification,
    // ORACLE-CHECKED end to end: md5-seeded signatures (q29's replayable
    // 60-bit SimHash fold) let the oracle reproduce the FULL pipeline —
    // distinct-signature collapse, the 4x16-bit band explode, the capped
    // candidate join, bit_count(xor) verification, and both expansions.
    // Production keeps xxhash64 (q359's planted gate).
    Q("q31_simhash_neardup", {
      def dec(hx: String) = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * " +
          s"${BigInt(16).pow(15 - i)}").mkString("(", " + ", ")")
      val bits = (0 until 60).map(b =>
        s"(CASE WHEN sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) " +
          s"> 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      val bandStructs = (0 until 4).map(b =>
        s"{'band': $b, 'bucket': (sg >> ${b * 16}) & 65535}").mkString(", ")
      Some("WITH tok AS (SELECT doc_id, " +
        s"unnest($ltokensSql) AS t FROM documents), " +
        "th AS (SELECT doc_id, substr(md5(t), 1, 15) AS hx FROM tok), " +
        s"hh AS (SELECT doc_id, ${dec("hx")} AS h FROM th), " +
        s"sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS sg " +
        "FROM hh GROUP BY doc_id), " +
        "reps AS (SELECT sg, min(doc_id) AS rid FROM sig GROUP BY sg), " +
        s"banded AS (SELECT sg, rid, unnest([$bandStructs], " +
        "recursive := true) FROM reps), " +
        "ranked AS (SELECT sg, rid, band, bucket, row_number() OVER " +
        "(PARTITION BY band, bucket ORDER BY rid) AS rn FROM banded), " +
        "cand AS (SELECT DISTINCT a.sg AS sa, b.sg AS sb " +
        "FROM ranked a JOIN ranked b ON a.band = b.band " +
        "AND a.bucket = b.bucket AND " +
        "((a.rn < b.rn AND b.rn <= 4096) OR b.rn = a.rn + 1)), " +
        "ver AS (SELECT sa, sb, CAST(bit_count(xor(sa, sb)) AS INTEGER) " +
        "AS hamming FROM cand WHERE bit_count(xor(sa, sb)) <= 8) " +
        "SELECT least(x.doc_id, y.doc_id) AS id_a, " +
        "greatest(x.doc_id, y.doc_id) AS id_b, hamming " +
        "FROM ver JOIN sig x ON x.sg = ver.sa JOIN sig y ON y.sg = ver.sb " +
        "UNION ALL SELECT x.doc_id, y.doc_id, CAST(0 AS INTEGER) " +
        "FROM sig x JOIN sig y ON x.sg = y.sg AND x.doc_id < y.doc_id " +
        "ORDER BY id_a, id_b")
    },
      (s, dir) => Dedup.simhashDedup(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 8, md5Seeded = true).orderBy("id_a", "id_b")),

    // ---- deterministic held-out split: md5-hex threshold compare, the
    // same fixed-width-hex trick in both engines (train/valid/test at
    // 0.8/0.1/0.1; 0.8*2^32 = 0xcccccccc, 0.9*2^32 = 0xe6666666).
    Q("q51_hash_split",
      Some("WITH s AS (SELECT doc_id, CASE " +
        "WHEN substring(md5('graft-v1' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train' " +
        "WHEN substring(md5('graft-v1' || CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'valid' " +
        "ELSE 'test' END AS split FROM documents) " +
        "SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id " +
        "FROM s GROUP BY split ORDER BY split"),
      (s, dir) => Curation.hashSplit(Tables.documents(s, dir), col("doc_id"),
          "graft-v1", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy("split").agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("split")),

    // ---- GPT-style sequence packing: concat in id order per shard, cut
    // every 512 tokens; per-shard windowed running sum in both engines.
    Q("q52_pack_sequences",
      // CAST to INTEGER: dtype parity, cf. q60 note
      Some(s"WITH t AS (SELECT doc_id AS id, doc_id % 8 AS shard, CAST(len($tokensSql) AS INTEGER) AS n_tokens FROM documents), " +
        "c AS (SELECT id, shard, n_tokens, " +
        "CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS tok_start FROM t) " +
        "SELECT id, shard, CAST(FLOOR(tok_start / 512.0) AS BIGINT) AS seq_in_shard, " +
        "tok_start, n_tokens FROM c ORDER BY id"),
      (s, dir) => Curation.packSequences(Tables.documents(s, dir), "doc_id", "text",
        tokenBudget = 512, numShards = 8).orderBy("id")),

    // ---- composed curation pass: language filter -> quality filter ->
    // exact dedup keep-list; the full pre-tokenization pipeline, mirrored
    // end-to-end in SQL (langid CASE from q27, quality formula from q25).
    Q("q53_curate",
      Some {
        val hitCols = TA.LangProfiles.map { case (lang, words) =>
          val list = words.map(w => s"'$w'").mkString("(", ", ", ")")
          s"len(list_filter($ltokensSql, x -> x IN $list)) AS h_$lang"
        }.mkString(", ")
        val langs = TA.LangProfiles.map(_._1)
        val mx = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
        val pick = langs.map(l => s"WHEN h_$l = __mx THEN '$l'").mkString(" ")
        s"WITH hits AS (SELECT doc_id, text, $hitCols FROM documents), " +
          s"mm AS (SELECT doc_id, text, $mx AS __mx, ${langs.map(l => s"h_$l").mkString(", ")} FROM hits), " +
          s"lid AS (SELECT doc_id, text, CASE WHEN __mx = 0 THEN 'und' $pick END AS lang FROM mm), " +
          s"m AS (SELECT doc_id, text, lang, CAST(len($tokensSql) AS DOUBLE) AS nt, " +
          "CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio, " +
          s"CAST(len(list_filter($ltokensSql, x -> x IN $stopList)) AS DOUBLE) / len($ltokensSql) AS stop_ratio, " +
          s"CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len($tokensSql) AS mtl FROM lid), " +
          "q AS (SELECT doc_id, lang, round(least(nt / 50.0, 1.0) * 0.3 + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 + " +
          "least(stop_ratio * 5.0, 1.0) * 0.3 + (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality, " +
          s"md5($normSql) AS fp FROM m WHERE lang = 'en'), " +
          "f AS (SELECT doc_id, lang, quality, fp FROM q WHERE quality >= 0.5), " +
          "k AS (SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY fp) " +
          "SELECT f.doc_id, f.lang, f.quality FROM f JOIN k ON f.fp = k.fp AND f.doc_id = k.doc_id " +
          "ORDER BY f.doc_id"
      },
      (s, dir) => Curation.curate(Tables.documents(s, dir), "doc_id", "text",
        lang = "en", minQuality = 0.5).orderBy("doc_id"))
    ,

    // ---- hashed-feature linear classifier scoring (fastText-style
    // triage): uni+bigram features, md5 feature-hash into 2^20 buckets, a
    // per-(bucket, class) INTEGER weight derived arithmetically (a
    // deterministic stand-in for a trained matrix - the dataflow, not the
    // weights, is the product), per-class score folds and an argmax with
    // ties to the lowest class. Entirely row-local: ZERO exchanges for
    // 100 TB of documents (PlanSpec-pinned).
    Q("q215_classifier", {
      import graft.pipeline.Classifier.{HashA, HashC, Mod}
      val half = Mod / 2
      val scoreSql = (0 until 4).map { k =>
        s"CAST(list_sum(list_transform(bs, b -> (b * $HashA + $k * $HashC) % $Mod - $half)) AS BIGINT) AS score_$k"
      }.mkString(", ")
      Some("WITH t AS (SELECT doc_id, " + ltokensSql + " AS tk FROM documents), " +
        "f AS (SELECT doc_id, tk || CASE WHEN len(tk) >= 2 " +
        "THEN [tk[i] || '_' || tk[i+1] for i in range(1, len(tk))] " +
        "ELSE [] END AS fs FROM t), " +
        "bk AS (SELECT doc_id, list_transform(fs, x -> " +
        "('0x' || substring(md5('clf' || x), 1, 8))::BIGINT % 1048576) AS bs FROM f), " +
        s"s AS (SELECT doc_id, $scoreSql FROM bk) " +
        "SELECT doc_id, score_0, score_1, score_2, score_3, " +
        "CASE WHEN score_0 >= score_1 AND score_0 >= score_2 AND score_0 >= score_3 THEN 0 " +
        "WHEN score_1 >= score_2 AND score_1 >= score_3 THEN 1 " +
        "WHEN score_2 >= score_3 THEN 2 ELSE 3 END AS pred_class " +
        "FROM s ORDER BY doc_id")
    },
      (s, dir) => graft.pipeline.Classifier.scoreDocuments(
          Tables.documents(s, dir), "text", nClasses = 4)
        .select(col("doc_id"), col("score_0"), col("score_1"), col("score_2"),
          col("score_3"), col("pred_class"))
        .orderBy("doc_id")),

    // ---- whole-corpus exact set-similarity join via prefix filtering
    // (AllPairs/PPJoin): the blockless exact-Jaccard join - candidates
    // only where two docs share a token among their RAREST
    // (n - ceil(tau n) + 1) tokens under one global (freq, token) order,
    // then integer cross-multiply verification. Features are 3-gram
    // shingles (token sets barely separate this templated corpus - the
    // shingle Jaccard distribution is near-bimodal); corpus = every 7th
    // doc plus the FIRST-HALF-token truncation of every 14th (truncation
    // preserves contiguous shingles, planting ~J=1/2 pairs that exercise
    // the mid-range threshold); oracle = naive all-pairs over the same
    // corpus - prefix filtering is LOSSLESS, so the hash gate proves it
    // dropped no true pair.
    Q("q217_setsim_join",
      Some("WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0 " +
        "UNION ALL SELECT doc_id + 1000000, " +
        "array_to_string(" + ltokensSql + "[1:len(" + ltokensSql + ") // 2], ' ') " +
        "FROM documents WHERE doc_id % 14 = 0), " +
        s"t AS (SELECT doc_id, ($shinglesSql) AS tk FROM corpus), " +
        "sz AS (SELECT doc_id, tk, len(tk) AS n FROM t) " +
        // CAST to INTEGER: dtype parity, cf. q60 note
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(len(list_intersect(a.tk, b.tk)) AS INTEGER) AS n_inter, " +
        "CAST(a.n + b.n - len(list_intersect(a.tk, b.tk)) AS INTEGER) AS n_union " +
        "FROM sz a JOIN sz b ON a.doc_id < b.doc_id " +
        "AND a.n * 5 >= b.n * 2 AND b.n * 5 >= a.n * 2 " +
        "WHERE len(list_intersect(a.tk, b.tk)) * 5 >= (a.n + b.n - len(list_intersect(a.tk, b.tk))) * 2 " +
        "ORDER BY id_a, id_b"),
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val tk = split(trim(lower(col("text"))), "\\s+")
        val truncated = d.filter(pmod(col("doc_id"), lit(14)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            array_join(slice(tk, lit(1), floor(size(tk) / 2).cast("int")), " ")
              .as("text"))
        val corpus = d.filter(pmod(col("doc_id"), lit(7)) === 0).union(truncated)
        Dedup.setSimJoinPrefix(corpus, "doc_id",
            Dedup.wordShingles(col("text"), 3), tauNum = 2, tauDen = 5)
          .orderBy("id_a", "id_b")
      }),

    // ---- greedy longest-match subword segmentation (WordPiece/BPE-vocab
    // inference with a deterministic demo vocab; single chars fall through
    // losslessly): the per-word iterative consume is a custom kernel on
    // the Spark side and a recursive CTE on the oracle side - per DISTINCT
    // word (segmentation is a pure word function), with corpus counts
    // joined back. Output: corpus piece frequencies.
    Q("q219_wordpiece", {
      val vocabList = TA.PieceVocab.map(v => s"'$v'").mkString("[", ", ", "]")
      Some("WITH RECURSIVE " +
        s"vocab(v) AS (SELECT unnest($vocabList)), " +
        s"wc AS (SELECT unnest($ltokensSql) AS w FROM documents), " +
        "words AS (SELECT w, count(*) AS cnt FROM wc GROUP BY w), " +
        "seg AS (SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks FROM words " +
        "UNION ALL SELECT s.w, s.pos + length(s.t) AS pos, s.toks || [s.t] AS toks FROM (" +
        "SELECT w, pos, toks, coalesce(max_by(v, length(v)), substring(w, pos, 1)) AS t " +
        "FROM seg LEFT JOIN vocab ON substring(seg.w, seg.pos, length(v)) = v " +
        "WHERE pos <= length(w) GROUP BY w, pos, toks) s), " +
        "pieces AS (SELECT seg.w, unnest(seg.toks) AS piece FROM seg WHERE seg.pos > length(seg.w)) " +
        "SELECT piece, CAST(sum(words.cnt) AS BIGINT) AS n FROM pieces " +
        "JOIN words ON pieces.w = words.w GROUP BY piece ORDER BY piece")
    },
      (s, dir) => Tables.documents(s, dir)
        .select(explode(graft.functions.SegmentExprs.greedyPieces(
          col("text"), TA.PieceVocab)).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("n"))
        .orderBy("piece")),

    // ---- CCNet-style LM-perplexity scoring, self-trained: avg negative
    // log-likelihood per doc under an add-one bigram LM fit on the corpus
    // itself. Each ln term casts DECIMAL(28,12) at the source (q194
    // discipline) so the per-doc sum is exact and shuffle-order-
    // independent; the one IEEE division comes last, 6dp. Docs with < 2
    // tokens report null.
    Q("q228_lm_perplexity", {
      val lt = ltokensSql
      Some(s"WITH t AS (SELECT doc_id, $lt AS tk FROM documents), " +
        "bi AS (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS bg " +
        "FROM t WHERE len(tk) >= 2), " +
        "c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY 1), " +
        "c1 AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1), " +
        "v AS (SELECT count(DISTINCT w) AS V FROM (SELECT unnest(tk) AS w FROM t)), " +
        "s AS (SELECT bi.doc_id, CAST(ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.V AS DOUBLE)) AS DECIMAL(28,12)) AS term " +
        "FROM bi JOIN c2 USING (bg) JOIN c1 ON c1.w1 = string_split(bi.bg, ' ')[1] CROSS JOIN v), " +
        "a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "round(CAST(-sum(term) AS DOUBLE) / count(*), 6) AS avg_nll FROM s GROUP BY 1) " +
        "SELECT d.doc_id, a.n_bigrams, a.avg_nll FROM documents d " +
        "LEFT JOIN a USING (doc_id) ORDER BY d.doc_id")
    },
      (s, dir) => TA.lmPerplexityScore(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll"))
        .orderBy("doc_id")),

    // ---- Jensen-Shannon divergence between two sources' token
    // distributions: the symmetric, finite (<= ln 2) mixture-shift score —
    // counts collapse to the (token x side) relation once, every ln term
    // casts DECIMAL(28,12) at the source, one x0.5+x0.5 IEEE finish.
    Q("q234_js_divergence", {
      val lt = ltokensSql
      Some(s"WITH w AS (SELECT source, unnest($lt) AS tok FROM documents " +
        "WHERE source IN ('src0', 'src1')), " +
        "c AS (SELECT tok, sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb FROM w GROUP BY 1), " +
        "t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_tokens_a, " +
        "CAST(sum(cb) AS BIGINT) AS n_tokens_b FROM c), " +
        "m AS (SELECT n_tokens_a, n_tokens_b, " +
        "CAST(ca AS DOUBLE) / CAST(n_tokens_a AS DOUBLE) AS p, " +
        "CAST(cb AS DOUBLE) / CAST(n_tokens_b AS DOUBLE) AS q, ca, cb FROM c, t), " +
        "s AS (SELECT n_tokens_a, n_tokens_b, " +
        "CASE WHEN ca > 0 THEN CAST(p * ln(p / ((p + q) / 2.0)) AS DECIMAL(28,12)) END AS ta, " +
        "CASE WHEN cb > 0 THEN CAST(q * ln(q / ((p + q) / 2.0)) AS DECIMAL(28,12)) END AS tb " +
        "FROM m) " +
        "SELECT n_tokens_a, n_tokens_b, " +
        "round(CAST(sum(ta) AS DOUBLE) * 0.5 + CAST(sum(tb) AS DOUBLE) * 0.5, 6) " +
        "AS jsd FROM s GROUP BY 1, 2")
    },
      (s, dir) => TA.jsDivergence(Tables.documents(s, dir), "source", "text",
        "src0", "src1")),

    // ---- leakage-safe split: q48's near-dup clusters (singletons = their
    // own cluster) hashed through q51's md5 split draw on the CLUSTER key,
    // so near-copies can never straddle train/test. Oracle = the recursive
    // transitive closure + the identical fixed-width-hex CASE.
    Q("q239_leakage_split",
      Some(s"WITH RECURSIVE sh AS (SELECT doc_id, $shinglesSql AS s FROM documents), " +
        "blk AS (SELECT doc_id, s, list_aggregate(s, 'min') AS b FROM sh), " +
        "edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM blk a JOIN blk b ON a.b = b.b AND a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.8), " +
        "und AS (SELECT id_a AS src, id_b AS dst FROM edges UNION SELECT id_b, id_a FROM edges), " +
        "reach AS (SELECT src, dst FROM und " +
        "UNION SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src), " +
        "lab AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster FROM reach GROUP BY src), " +
        "a AS (SELECT d.doc_id, coalesce(lab.cluster, d.doc_id) AS cluster " +
        "FROM documents d LEFT JOIN lab USING (doc_id)) " +
        "SELECT doc_id, cluster, CASE " +
        "WHEN substring(md5('split-v1' || CAST(cluster AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train' " +
        "WHEN substring(md5('split-v1' || CAST(cluster AS VARCHAR)), 1, 8) < 'e6666666' THEN 'valid' " +
        "ELSE 'test' END AS split FROM a ORDER BY doc_id"),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          blockCol = array_min(Dedup.wordShingles(col("text"), 3)),
          n = 3, threshold = 0.8)
        Curation.leakageSafeSplit(docs.select(col("doc_id")), "doc_id",
            edges, "split-v1",
            Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
          .orderBy("doc_id")
      }),

    // ---- containment (asymmetric-Jaccard) pairs: near-SUBSET detection
    // where symmetric Jaccard goes blind — planted half-doc fragments
    // against their originals, blocked by source; both orientations
    // reported, pairs emitted once.
    // ---- whole-corpus containment join via asymmetric prefix filtering:
    // the r10 verdict's block-quadratic q249 retired — no source block,
    // no all-pairs-within-block. I/|A| >= tau OR I/|B| >= tau iff
    // I >= tau*min(|A|,|B|), so only the SMALLER set prefixes (rarest
    // n - ceil(tau n) + 1 shingles under the global frequency order) and
    // the larger side indexes fully; candidates are token-keyed and
    // LOSSLESS, verification is the integer cross-multiply gate. Corpus =
    // every 9th doc plus half-token truncations of every 18th (planted
    // near-subsets); oracle = naive all-pairs with the SAME integer gate,
    // proving the prefix join dropped no true pair.
    Q("q249_containment", {
      val lt = ltokensSql
      Some("WITH corpus AS (SELECT doc_id, text FROM documents " +
        "WHERE doc_id % 9 = 0 " +
        "UNION ALL SELECT doc_id + 2000000, " +
        s"array_to_string($lt[1:len($lt) // 2], ' ') " +
        "FROM documents WHERE doc_id % 18 = 0), " +
        s"t AS (SELECT doc_id, ($shinglesSql) AS sh FROM corpus), " +
        "s AS (SELECT doc_id, sh, len(sh) AS n FROM t WHERE len(sh) > 0) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / a.n, 6) " +
        "AS containment_a_in_b, " +
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / b.n, 6) " +
        "AS containment_b_in_a " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.sh, b.sh)) * 10 >= 9 * least(a.n, b.n) " +
        "ORDER BY id_a, id_b")
    },
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val tk = split(trim(lower(col("text"))), "\\s+")
        val fragments = d.filter(pmod(col("doc_id"), lit(18)) === 0)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            array_join(slice(tk, lit(1), floor(size(tk) / 2).cast("int")), " ")
              .as("text"))
        val corpus = d.filter(pmod(col("doc_id"), lit(9)) === 0)
          .union(fragments)
        Dedup.containmentJoinPrefix(corpus, "doc_id",
            Dedup.wordShingles(col("text"), 3), tauNum = 9, tauDen = 10)
          .orderBy("id_a", "id_b")
      }),

    // ---- per-source top-5 vocabulary: q72 at group grain — one (group,
    // token) combinable count, a group-partitioned rank window over the
    // per-group vocab relation.
    Q("q253_group_vocabulary",
      Some("WITH w AS (SELECT source, unnest(list_filter(" +
        s"$ltokensSql, t -> t != '')) AS token FROM documents), " +
        "c AS (SELECT source, token, count(*) AS n FROM w GROUP BY 1, 2), " +
        "r AS (SELECT source, token, n, CAST(row_number() OVER " +
        "(PARTITION BY source ORDER BY n DESC, token ASC) AS INT) AS rank FROM c) " +
        "SELECT source, rank, token, n FROM r WHERE rank <= 5 " +
        "ORDER BY source, rank"),
      (s, dir) => TA.vocabularyByGroup(Tables.documents(s, dir),
        "source", "text", topK = 5).orderBy("source", "rank"))
  ,

    // ---- TextRank keywords: integer-exact PageRank (3 rounds, q136's
    // micro-unit recurrence) over the distinct +-2 skip-gram co-occurrence
    // graph — the oracle composes q114's pair CTE with q136's unrolled
    // rounds.
    Q("q257_textrank", {
      val rounds = (1 to 3).map { i =>
        s"i$i AS (SELECT e.dst AS node, sum(r${i - 1}.r // deg.deg) AS m " +
          s"FROM r${i - 1} JOIN e ON r${i - 1}.node = e.src " +
          "JOIN deg ON e.src = deg.src GROUP BY 1), " +
          s"r$i AS (SELECT nodes.node, nn.tp + (17 * coalesce(i$i.m, 0)) // 20 AS r " +
          s"FROM nodes LEFT JOIN i$i USING (node), nn)"
      }.mkString(", ")
      Some("WITH t AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks " +
        "FROM documents), " +
        "ix AS (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM t), " +
        "o AS (SELECT toks, i, unnest([x for x in [-2, -1, 1, 2] " +
        "if i + x >= 1 AND i + x <= len(toks)]) AS o FROM ix), " +
        "p AS (SELECT toks[i] AS src, toks[i + o] AS dst FROM o), " +
        "e AS (SELECT DISTINCT src, dst FROM p WHERE src <> dst), " +
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1), " +
        "nn AS (SELECT count(*) AS n, (3 * 1000000000000) // (20 * count(*)) AS tp FROM nodes), " +
        "r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, nn), " +
        rounds + " " +
        // CAST to BIGINT: DuckDB sum() yields HUGEINT → pandas float64,
        // while Spark emits int64 — the driver hash is dtype-sensitive
        "SELECT node AS token, CAST(r AS BIGINT) AS rank_micro, " +
        "round(CAST(r AS DOUBLE) / 1000000000000.0, 6) AS rank FROM r3 " +
        "ORDER BY rank_micro DESC, token LIMIT 15")
    },
      (s, dir) => TA.textRankKeywords(Tables.documents(s, dir), "text",
        window = 2, iters = 3, k = 15)),

    // ---- Pareto skyline on (n_tokens, n_chars): the multi-criteria
    // shortlist with no weighting function. Never the O(n²) dominance
    // join — per-x max collapse + one descending running-max sweep over
    // the bounded x DOMAIN, then a broadcast join back (both engines run
    // the identical sweep).
    Q("q266_skyline",
      // CAST to INTEGER: dtype parity, cf. q60 note
      Some(s"WITH t AS (SELECT doc_id, CAST(len($tokensSql) AS INTEGER) AS n_tokens, " +
        "CAST(length(text) AS INTEGER) AS n_chars FROM documents), " +
        "g AS (SELECT n_tokens, max(n_chars) AS ymax FROM t GROUP BY 1), " +
        "s AS (SELECT n_tokens, ymax, max(ymax) OVER (ORDER BY n_tokens DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dom FROM g), " +
        "k AS (SELECT n_tokens, ymax FROM s WHERE dom IS NULL OR dom < ymax) " +
        "SELECT t.doc_id, t.n_tokens, t.n_chars FROM t " +
        "JOIN k ON t.n_tokens = k.n_tokens AND t.n_chars = k.ymax " +
        "ORDER BY doc_id"),
      (s, dir) => Ops.skyline(
          Tables.documents(s, dir).select(col("doc_id"),
            TA.tokenCount(col("text")).as("n_tokens"),
            TA.charCount(col("text")).as("n_chars")),
          "n_tokens", "n_chars")
        .orderBy("doc_id")),

    // ---- the SQL surface end-to-end: graft's registered Catalyst
    // expressions (langid, word_shingles, lenient_date) driven through
    // spark.sql() on a live session via GraftExtensions.registerAll — the
    // §2.10 registration path under the driver's hash gate, not just a
    // spec. Oracle replays langid's profile argmax (q27's CTE at doc
    // grain), the distinct-shingle count, and plain date arithmetic.
    Q("q285_sql_surface", {
      val hitCols = TA.LangProfiles.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString("(", ", ", ")")
        s"len(list_filter($ltokensSql, x -> x IN $list)) AS h_$lang"
      }.mkString(", ")
      val langs = TA.LangProfiles.map(_._1)
      val mx = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
      val pick = langs.map(l => s"WHEN h_$l = __mx THEN '$l'").mkString(" ")
      val sh3 = s"CASE WHEN len($ltokensSql) < 3 THEN 1 ELSE " +
        s"len(list_distinct([array_to_string($ltokensSql[i:i+2], ' ') " +
        s"for i in range(1, len($ltokensSql) - 1)])) END"
      // CAST to INTEGER: dtype parity, cf. q60 note
      Some(s"WITH hits AS (SELECT doc_id, CAST($sh3 AS INTEGER) AS n_shingles, $hitCols " +
        "FROM documents), " +
        s"m AS (SELECT doc_id, n_shingles, $mx AS __mx, * FROM hits) " +
        s"SELECT doc_id, CASE WHEN __mx = 0 THEN 'und' $pick END AS lang_pred, " +
        "n_shingles, " +
        "DATE '2024-01-01' + CAST(doc_id % 28 AS INTEGER) AS d " +
        "FROM m ORDER BY doc_id")
    },
      (s, dir) => {
        graft.GraftExtensions.registerAll(s)
        Tables.documents(s, dir).createOrReplaceTempView("graft_docs_sql")
        s.sql("SELECT doc_id, langid(text) AS lang_pred, " +
          "size(word_shingles(text, 3)) AS n_shingles, " +
          "lenient_date(concat('2024-1-', cast(doc_id % 28 + 1 AS string))) " +
          "AS d FROM graft_docs_sql ORDER BY doc_id")
      }),

    // ---- BM25 retrieval against a fixed query: Okapi scoring with
    // row-local tf projections (no (doc, term) explode), one broadcast
    // stats row, fixed-order term sum — q60's TF-IDF corrected for
    // length/saturation, under the hash gate.
    Q("q286_bm25", {
      val terms = Seq("query", "table", "data")
      val stats = "SELECT count(*) AS n, " +
        s"CAST(sum(CAST(len($ltokensSql) AS DECIMAL(18,0))) AS DOUBLE) / " +
        "count(*) AS avgdl" +
        terms.zipWithIndex.map { case (t, i) =>
          s", CAST(sum(CASE WHEN len(list_filter($ltokensSql, x -> x = '$t')) " +
            s"> 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
        }.mkString + " FROM documents"
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter($ltokensSql, x -> x = '$t')) AS DOUBLE) AS tf$i"
      }.mkString(", ")
      val score = terms.indices.map { i =>
        s"ln(1.0 + (CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / " +
          s"(CAST(df$i AS DOUBLE) + 0.5)) * tf$i * 2.2 / " +
          s"(tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))"
      }.mkString(" + ")
      Some(s"WITH st AS ($stats), " +
        s"d AS (SELECT doc_id, CAST(len($ltokensSql) AS DOUBLE) AS dl, " +
        s"$tfCols FROM documents), " +
        s"sc AS (SELECT doc_id, $score AS s FROM d, st) " +
        "SELECT doc_id, round(s, 6) AS score FROM sc " +
        "ORDER BY s DESC, doc_id LIMIT 20")
    },
      (s, dir) => TA.bm25TopDocs(Tables.documents(s, dir), "doc_id", "text",
        Seq("query", "table", "data"), k = 20)),

    // ---- per-document lexical diversity: type-token and hapax ratios
    // over the q72 whitespace tokenization; all-integer counts, one IEEE
    // division per ratio.
    Q("q302_lexical_diversity",
      Some("WITH tk AS (SELECT doc_id, unnest(list_filter(" +
        "regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t != '')) " +
        "AS token FROM documents), " +
        "g AS (SELECT doc_id, token, count(*) AS c FROM tk GROUP BY 1, 2), " +
        "d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "count(*) AS n_types, " +
        "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_hapax FROM g GROUP BY 1) " +
        "SELECT doc_id, n_tokens, n_types, n_hapax, " +
        "round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS ttr, " +
        "round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) " +
        "AS hapax_ratio FROM d ORDER BY doc_id"),
      (s, dir) => TA.lexicalDiversity(Tables.documents(s, dir), "doc_id",
          "text")
        .orderBy("doc_id")),

    // ---- one-row dataset card: corpus totals, language entropy
    // (DECIMAL(28,12) terms), exact-dup and short-doc rates — the
    // datasheet block a training corpus ships with.
    Q("q324_dataset_card",
      Some("WITH d AS (SELECT length(text) AS ch, " +
        "len(list_filter(regexp_split_to_array(trim(lower(text)), " +
        "'\\s+'), t -> t != '')) AS tk, md5(text) AS h, lang " +
        "FROM documents), " +
        "s AS (SELECT count(*) AS n_docs, count(DISTINCT lang) AS n_langs, " +
        "CAST(sum(CAST(ch AS HUGEINT)) AS BIGINT) AS total_chars, " +
        "CAST(sum(CAST(tk AS HUGEINT)) AS BIGINT) AS total_tokens, " +
        "count(DISTINCT h) AS nd, " +
        "CAST(sum(CASE WHEN ch < 100 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS nshort FROM d), " +
        "t AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d), " +
        "lc AS (SELECT lang, count(*) AS c FROM d GROUP BY 1), " +
        "le AS (SELECT CAST(sum(CAST(-(CAST(c AS DOUBLE) / n) * " +
        "ln(CAST(c AS DOUBLE) / n) AS DECIMAL(28,12))) AS DOUBLE) AS ent " +
        "FROM lc, t) " +
        "SELECT n_docs, n_langs, total_chars, total_tokens, " +
        "round(1.0 - CAST(nd AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) " +
        "AS dup_rate, " +
        "round(CAST(nshort AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) " +
        "AS short_rate, round(ent, 6) AS lang_entropy FROM s, le"),
      (s, dir) => TA.datasetCard(Tables.documents(s, dir), "text",
        col("lang"), shortChars = 100)),

    // ---- two-pass water-filling token budget across source domains:
    // B = half the corpus tokens, integer `div` arithmetic throughout
    // (non-negative terms, so DuckDB floor == Spark truncate); the oracle
    // unrolls the same two passes.
    Q("q327_token_budget",
      Some(s"WITH d0 AS (SELECT source AS domain, " +
        s"CAST(sum(len($tokensSql)) AS BIGINT) AS tokens FROM documents " +
        "GROUP BY 1), " +
        "d AS (SELECT domain, tokens, CAST(CAST(substr(domain, 4) AS " +
        "INTEGER) % 5 + 1 AS BIGINT) AS weight FROM d0), " +
        "t AS (SELECT CAST(CAST(sum(tokens) AS HUGEINT) // 2 AS BIGINT) " +
        "AS b, CAST(sum(weight) AS BIGINT) AS w FROM d), " +
        "p1 AS (SELECT domain, tokens, weight, " +
        "least(tokens, CAST((CAST(b AS HUGEINT) * weight) // w AS BIGINT)) " +
        "AS a1 FROM d, t), " +
        "l AS (SELECT t.b - s.sa AS lft, s.cap FROM t, " +
        "(SELECT CAST(sum(a1) AS BIGINT) AS sa, " +
        "CAST(sum(tokens - a1) AS BIGINT) AS cap FROM p1) s), " +
        "f AS (SELECT domain, tokens, weight, a1 + CASE WHEN cap > 0 THEN " +
        "least(tokens - a1, CAST((CAST(lft AS HUGEINT) * (tokens - a1)) " +
        "// cap AS BIGINT)) ELSE 0 END AS alloc_tokens FROM p1, l) " +
        "SELECT domain, tokens, weight, alloc_tokens, " +
        "CASE WHEN tokens > 0 THEN round(CAST(alloc_tokens AS DOUBLE) / " +
        "CAST(tokens AS DOUBLE), 6) END AS rate, " +
        "alloc_tokens = tokens AS filled FROM f ORDER BY domain"),
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .groupBy(col("source").as("domain"))
          .agg(sum(TA.tokenCount(col("text"))).as("tokens"))
          .withColumn("weight",
            expr("CAST(substring(domain, 4) AS INT) % 5 + 1"))
        Curation.tokenBudgetAllocation(d, "domain", col("tokens"),
            col("weight"), budgetNum = 1, budgetDen = 2)
          .orderBy("domain")
      }),

    // ---- weight-balanced shard manifest: hash-group scatter + per-group
    // descending round-robin with a group offset — the only window is
    // rank-within-group (fanout bounds the largest sort), no global sort.
    Q("q328_balanced_shards",
      Some("WITH d AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) " +
        "AS weight, doc_id % 8 AS grp FROM documents), " +
        "r AS (SELECT id, grp, weight, row_number() OVER " +
        "(PARTITION BY grp ORDER BY weight DESC, id) AS rank_in_grp FROM d) " +
        "SELECT id, grp, CAST(rank_in_grp AS INTEGER) AS rank_in_grp, " +
        "(rank_in_grp - 1 + grp) % 5 AS shard, weight FROM r ORDER BY id"),
      (s, dir) => Curation.balancedShards(Tables.documents(s, dir),
          "doc_id", col("n_chars"), numShards = 5, fanout = 8)
        .orderBy("id")),

    // ---- SimHash dedup proven on PLANTED exact duplicates (the q34/q50
    // discipline for the signature path): every 4th doc re-enters the
    // corpus verbatim at id+10⁶ — identical text → identical 64-bit
    // signature → the pair comes from the same-signature expansion branch
    // (hamming 0), which collapses BEFORE banding and is therefore immune
    // to the bucket skew cap. found must be TRUE for every plant; the
    // engine-specific xxhash pair surface stays rows-only in q31.
    Q("q359_simhash_planted",
      Some("SELECT doc_id AS id, doc_id + 1000000 AS planted_id, " +
        "TRUE AS found, 0 AS hamming FROM documents " +
        "WHERE doc_id % 4 = 0 ORDER BY id"),
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val planted = d.filter(pmod(col("doc_id"), lit(4L)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
        val pairs = Dedup.simhashDedup(d.unionByName(planted),
          "doc_id", "text", maxHamming = 8)
        d.filter(pmod(col("doc_id"), lit(4L)) === 0)
          .select(col("doc_id").as("id"))
          .join(pairs.filter(col("id_b") === col("id_a") + lit(1000000L))
              .select(col("id_a").as("id"), lit(true).as("found"),
                col("hamming")),
            Seq("id"), "left")
          .select(col("id"), (col("id") + lit(1000000L)).as("planted_id"),
            coalesce(col("found"), lit(false)).as("found"), col("hamming"))
          .orderBy("id")
      }),

    // ---- per-language vocabulary-richness estimators: bias-corrected
    // Chao1 (how many types infinite sampling would show) and Good-Turing
    // unseen mass f1/N (P(next token is new)) — the more-crawl-worth-it
    // gate, all-integer inputs off two key-bounded rollups.
    Q("q364_vocab_richness",
      Some(s"WITH tok AS (SELECT lang, unnest($ltokensSql) AS t " +
        "FROM documents), " +
        "tc AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM tok " +
        "WHERE t <> '' GROUP BY 1, 2), " +
        "g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "CAST(count(*) AS BIGINT) AS n_types, " +
        "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1, " +
        "CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2 " +
        "FROM tc GROUP BY 1) " +
        "SELECT lang, n_tokens, n_types, f1, f2, " +
        "round(CAST(n_types AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE) / " +
        "CAST(2 * (f2 + 1) AS DOUBLE), 6) AS chao1, " +
        "round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS p_unseen FROM g ORDER BY lang"),
      (s, dir) => TA.vocabularyRichness(Tables.documents(s, dir),
        Seq("lang"), "text").orderBy("lang"))
    ,

    // ---- MinHash sketch calibration against exact Jaccard over the q28
    // blocked pairs: 16 md5-salted hash functions (the q232 nibble
    // discipline, so BOTH engines compute the identical signature), the
    // position-agreement estimate vs the exact set Jaccard, and the
    // absolute error — "how honest is the sketch" as an oracle-checked
    // number. Production minhash keeps xxhash64 (q70's planted gate).
    Q("q371_minhash_calibration", {
      def dec(hx: String) = (1 to 15).map(i =>
        s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * " +
          s"${BigInt(16).pow(15 - i)}").mkString("(", " + ", ")")
      val sigCols = (0 until 16).map(i =>
        "CAST(list_min(list_transform(list_transform(s, " +
          s"g -> substr(md5('mh$i|' || g), 1, 15)), " +
          s"hx -> ${dec("hx")})) AS BIGINT) AS m$i").mkString(", ")
      val agree = (0 until 16).map(i =>
        s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
      Some(s"WITH sh AS (SELECT doc_id, $shinglesSql AS s FROM documents), " +
        "blk AS (SELECT doc_id, s, list_aggregate(s, 'min') AS b, " +
        s"$sigCols FROM sh) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        s"round(CAST(($agree) AS DOUBLE) / 16.0, 6) AS est_jaccard, " +
        "round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard, " +
        s"round(abs(round(CAST(($agree) AS DOUBLE) / 16.0, 6) - " +
        "round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(a.s, b.s))), 6)), 6) AS abs_err " +
        "FROM blk a JOIN blk b ON a.b = b.b AND a.doc_id < b.doc_id " +
        "ORDER BY id_a, id_b")
    },
      (s, dir) => {
        // materialize the shingle array BEFORE the signature (the q114
        // lesson), then the 16 salted md5 minima through the native
        // kernel (round-15 optimization — one MessageDigest pass instead
        // of 16 interpreted transform/array_min lambdas)
        val d = Tables.documents(s, dir).select(col("doc_id"),
          Dedup.wordShingles(col("text"), 3).as("s"))
        val withSig = d.select(col("doc_id"), col("s"),
          array_min(col("s")).as("b"),
          graft.functions.SketchExprs.md5MinhashSignature(col("s"), 16)
            .as("sig"))
        val est = round(
          size(filter(zip_with(col("a.sig"), col("b.sig"),
            (x, y) => x === y), p => p)).cast("double") / lit(16.0), 6)
        val jac = round(Dedup.jaccard(col("a.s"), col("b.s")), 6)
        withSig.as("a").join(withSig.as("b"),
            col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            est.as("est_jaccard"), jac.as("jaccard"),
            round(abs(est - jac), 6).as("abs_err"))
          .orderBy("id_a", "id_b")
      }),

    // ---- Fightin' Words (Monroe et al. 2008): log-odds with a Dirichlet
    // prior between English and the rest of the corpus — the principled
    // distinctive-terms list; z rounds 6dp BEFORE the rank so the top-k
    // cutoff is engine-identical.
    Q("q372_fightin_words",
      Some(s"WITH tok AS (SELECT lang = 'en' AS a, unnest($ltokensSql) " +
        "AS token FROM documents), " +
        "c AS (SELECT token, " +
        "CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b " +
        "FROM tok WHERE token <> '' GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n_a) AS BIGINT) AS na0, " +
        "CAST(sum(n_b) AS BIGINT) AS nb0, " +
        "CAST(count(*) AS BIGINT) AS v FROM c), " +
        "sc AS (SELECT token, n_a, n_b, " +
        "round(ln((CAST(n_a AS DOUBLE) + 0.5) / (CAST(na0 AS DOUBLE) + " +
        "CAST(v AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) - 0.5)) - " +
        "ln((CAST(n_b AS DOUBLE) + 0.5) / (CAST(nb0 AS DOUBLE) + " +
        "CAST(v AS DOUBLE) / 2.0 - CAST(n_b AS DOUBLE) - 0.5)), 6) AS delta, " +
        "round((ln((CAST(n_a AS DOUBLE) + 0.5) / (CAST(na0 AS DOUBLE) + " +
        "CAST(v AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) - 0.5)) - " +
        "ln((CAST(n_b AS DOUBLE) + 0.5) / (CAST(nb0 AS DOUBLE) + " +
        "CAST(v AS DOUBLE) / 2.0 - CAST(n_b AS DOUBLE) - 0.5))) / " +
        "sqrt(1.0 / (CAST(n_a AS DOUBLE) + 0.5) + " +
        "1.0 / (CAST(n_b AS DOUBLE) + 0.5)), 6) AS z " +
        "FROM c, t WHERE n_a + n_b >= 5) " +
        "SELECT token, n_a, n_b, delta, z FROM " +
        "(SELECT *, row_number() OVER (ORDER BY z DESC, token) AS r " +
        "FROM sc) WHERE r <= 20 ORDER BY z DESC, token"),
      (s, dir) => TA.fightinWords(Tables.documents(s, dir), "text",
          col("lang") === "en", minCount = 5L, k = 20)
        .orderBy(col("z").desc, col("token")))
    ,

    // ---- tokenizer-fertility profile per language: characters per
    // whitespace token and tokens per document — the per-language cost
    // model behind token-budget planning (high-fertility languages burn
    // budget faster). All-integer sums, two fixed IEEE ratios.
    Q("q379_token_fertility", {
      val tokensSql = """regexp_split_to_array(trim(text), '\s+')"""
      Some("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        s"CAST(sum(len($tokensSql)) AS BIGINT) AS total_tokens, " +
        s"round(CAST(sum(n_chars) AS DOUBLE) / CAST(sum(len($tokensSql)) " +
        "AS DOUBLE), 6) AS chars_per_token, " +
        s"round(CAST(sum(len($tokensSql)) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS tokens_per_doc " +
        "FROM documents GROUP BY 1 ORDER BY 1")
    },
      (s, dir) => Tables.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(TA.tokenCount(col("text")).cast("long")).as("total_tokens"))
        .select(col("lang"), col("n_docs"), col("total_chars"),
          col("total_tokens"),
          round(col("total_chars").cast("double") /
            col("total_tokens").cast("double"), 6).as("chars_per_token"),
          round(col("total_tokens").cast("double") /
            col("n_docs").cast("double"), 6).as("tokens_per_doc"))
        .orderBy("lang"))
  )
}
