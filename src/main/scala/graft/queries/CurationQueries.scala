package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Curation, Dedup, Web, TextAnalysis => TA}

/** Curation-pipeline queries over the `documents` table: repetition-based
  * quality filters, PII redaction, benchmark contamination, deterministic
  * mixture sampling. Every query is oracle-checked — each operator is
  * deterministic arithmetic / regex / md5 by construction, so DuckDB can
  * mirror it exactly.
  */
object CurationQueries {

  private val ltokensSql = """regexp_split_to_array(trim(lower(text)), '\s+')"""
  private val normSql = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""

  /** Non-distinct n-gram list in DuckDB (mirrors [[Curation.ngramsAll]]):
    * DuckDB list slices are INCLUSIVE, so toks[i:i+n-1] is n tokens. */
  private def ngramsAllSql(n: Int): String =
    s"""CASE WHEN len($ltokensSql) < $n THEN [array_to_string($ltokensSql, ' ')]
       | ELSE [array_to_string($ltokensSql[i:i+${n - 1}], ' ')
       |   for i in range(1, len($ltokensSql) - ${n - 2})] END""".stripMargin
      .replaceAll("\n", " ")

  /** Distinct n-gram list (mirrors Dedup.wordShingles). */
  private def shinglesSql(n: Int): String =
    s"""CASE WHEN len($ltokensSql) < $n THEN [array_to_string($ltokensSql, ' ')]
       | ELSE list_distinct([array_to_string($ltokensSql[i:i+${n - 1}], ' ')
       |   for i in range(1, len($ltokensSql) - ${n - 2})]) END""".stripMargin
      .replaceAll("\n", " ")

  // PII patterns as DuckDB (RE2) string literals — single-quoted SQL strings
  // don't process backslashes, so the pattern text is identical to the Java
  // side's.
  // deterministic URL augmentation shared by q71/q88: five host families
  // (subdomained .example.com, userinfo+port under a co.uk two-level
  // suffix, bare .org apex, IPv4 literal, numbered cdn subdomain) keyed on
  // doc_id — both engines must build byte-identical URLs
  private val synthUrlSql = "CASE doc_id % 5 " +
    "WHEN 0 THEN 'https://www.' || source || '-news.example.com/articles/' || doc_id " +
    "WHEN 1 THEN 'http://user:pw@blog.' || source || '.co.uk:8080/posts/' || doc_id || '?page=2' " +
    "WHEN 2 THEN 'https://' || source || '.org/wiki/Item_' || doc_id || '#frag' " +
    "WHEN 3 THEN 'http://192.168.' || (doc_id % 256) || '.7/raw/' || doc_id " +
    "ELSE 'https://cdn-' || (doc_id % 10) || '.' || source || '.io/assets/app.js' END"

  private def synthUrl: Column =
    when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("https://www."), col("source"),
          lit("-news.example.com/articles/"), col("doc_id")))
      .when(pmod(col("doc_id"), lit(5)) === 1,
        concat(lit("http://user:pw@blog."), col("source"), lit(".co.uk:8080/posts/"),
          col("doc_id"), lit("?page=2")))
      .when(pmod(col("doc_id"), lit(5)) === 2,
        concat(lit("https://"), col("source"), lit(".org/wiki/Item_"),
          col("doc_id"), lit("#frag")))
      .when(pmod(col("doc_id"), lit(5)) === 3,
        concat(lit("http://192.168."), pmod(col("doc_id"), lit(256)),
          lit(".7/raw/"), col("doc_id")))
      .otherwise(concat(lit("https://cdn-"), pmod(col("doc_id"), lit(10)),
        lit("."), col("source"), lit(".io/assets/app.js")))

  private val emailSql = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipSql = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val phoneSql = "\\+\\d[\\d-]{7,}\\d"

  val qs: Seq[Q] = Seq(

    // ---- Gopher-style repetition stats: repeated-token ratio, duplicate-
    // line fraction, most frequent bigram + the character fraction it
    // covers. All row-local expressions (the top-gram is a sorted run-
    // length fold, not an explode+groupBy) — zero shuffle at any scale.
    Q("q54_repetition",
      Some(s"WITH g AS (SELECT doc_id, text, $ltokensSql AS toks, ${ngramsAllSql(2)} AS grams FROM documents), " +
        "u AS (SELECT doc_id, unnest(grams) AS gram FROM g), " +
        "c AS (SELECT doc_id, gram, count(*) AS n FROM u GROUP BY 1, 2), " +
        "m AS (SELECT doc_id, max(n) AS mx FROM c GROUP BY 1), " +
        "top AS (SELECT c.doc_id, min(c.gram) AS top_bigram, min(c.n) AS top_n " +
        "  FROM c JOIN m ON c.doc_id = m.doc_id AND c.n = m.mx GROUP BY 1) " +
        "SELECT g.doc_id, " +
        "round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS rep_token_ratio, " +
        "round(1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE) / len(string_split(text, chr(10))), 6) AS dup_line_frac, " +
        "top.top_bigram, " +
        s"CASE WHEN length($normSql) > 0 THEN round(top.top_n * CAST(length(top.top_bigram) AS DOUBLE) / length($normSql), 6) ELSE 0.0 END AS top_bigram_frac " +
        "FROM g JOIN top ON g.doc_id = top.doc_id ORDER BY g.doc_id"),
      (s, dir) => {
        val top = Curation.topNgram(col("text"), 2)
        Tables.documents(s, dir).select(col("doc_id"),
            Curation.repeatedTokenRatio(col("text")).as("rep_token_ratio"),
            Curation.dupLineFraction(col("text")).as("dup_line_frac"),
            top.getField("gram").as("top_bigram"),
            Curation.topNgramCharFraction(top, col("text")).as("top_bigram_frac"))
          .orderBy("doc_id")
      }),

    // ---- PII redaction: the testdata is synthetic word-soup, so both
    // engines append the SAME deterministic PII (email, IPv4, phone derived
    // from doc_id) and then count + redact it — the oracle checks the regex
    // semantics end-to-end, including replacement order.
    Q("q55_pii_redact",
      Some("WITH a AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@mail.example.com from 10.' || CAST(doc_id % 256 AS VARCHAR) || " +
        "'.0.7 call +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0') AS aug FROM documents) " +
        // CAST to INTEGER: DuckDB len() is BIGINT, Spark size() is int —
        // the driver hash is dtype-sensitive
        s"SELECT doc_id, CAST(len(regexp_extract_all(aug, '$emailSql')) AS INTEGER) AS n_emails, " +
        s"CAST(len(regexp_extract_all(aug, '$ipSql')) AS INTEGER) AS n_ips, " +
        s"CAST(len(regexp_extract_all(aug, '$phoneSql')) AS INTEGER) AS n_phones, " +
        s"regexp_replace(regexp_replace(regexp_replace(aug, '$emailSql', '<EMAIL>', 'g'), " +
        s"'$ipSql', '<IP>', 'g'), '$phoneSql', '<PHONE>', 'g') AS redacted " +
        "FROM a ORDER BY doc_id"),
      (s, dir) => {
        val aug = concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example.com from 10."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.7 call +1555"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 7, "0"))
        Tables.documents(s, dir).select(col("doc_id"), aug.as("aug"))
          .select(col("doc_id"),
            Curation.piiEmailCount(col("aug")).as("n_emails"),
            Curation.piiIpCount(col("aug")).as("n_ips"),
            Curation.piiPhoneCount(col("aug")).as("n_phones"),
            Curation.piiRedact(col("aug")).as("redacted"))
          .orderBy("doc_id")
      }),

    // ---- benchmark contamination: corpus docs sharing a 5-gram with the
    // "benchmark" slice (doc_id < 20). Benchmark grams broadcast; the
    // corpus never shuffles — only hit rows reach the doc-id aggregation.
    Q("q56_contamination",
      Some(s"WITH g AS (SELECT doc_id, ${shinglesSql(5)} AS grams FROM documents), " +
        "b AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20), " +
        "c AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20) " +
        "SELECT c.doc_id, count(*) AS n_overlap FROM c JOIN b USING (gram) " +
        "GROUP BY c.doc_id ORDER BY c.doc_id"),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.contamination(docs.filter(col("doc_id") >= 20),
            docs.filter(col("doc_id") < 20), "doc_id", "text", n = 5)
          .orderBy("doc_id")
      }),

    // ---- n-gram novelty vs a reference corpus (contamination's
    // complement): fraction of each even doc's DISTINCT 3-grams absent
    // from the odd docs' gram set. Spark joins on md5(gram) (narrow
    // shuffle); the oracle joins the gram text — identical results.
    Q("q107_novelty",
      Some(s"WITH g AS (SELECT doc_id, ${shinglesSql(3)} AS grams FROM documents), " +
        "r AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 2 = 1), " +
        "c AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 2 = 0), " +
        "j AS (SELECT c.doc_id, r.gram IS NOT NULL AS seen FROM c LEFT JOIN r ON c.gram = r.gram) " +
        "SELECT doc_id, count(*) AS n_grams, " +
        "CAST(sum(CASE WHEN NOT seen THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
        "round(CAST(sum(CASE WHEN NOT seen THEN 1 ELSE 0 END) AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS novelty " +
        "FROM j GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.ngramNovelty(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
            docs.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
            n = 3)
          .orderBy("doc_id")
      }),

    // ---- deterministic mixture sampling: per-source keep rates (0.9 for
    // src0-4, 0.5 for src5-9, 0.15 otherwise) via the md5-threshold draw;
    // the oracle rebuilds the same rate CASE and hex cut.
    Q("q57_mixture_sample",
      Some("WITH r AS (SELECT doc_id, source, least(greatest(CASE " +
        "WHEN source IN ('src0','src1','src2','src3','src4') THEN 0.9 " +
        "WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.5 " +
        "ELSE 0.15 END, 0.0), 1.0) AS rate FROM documents), " +
        "k AS (SELECT doc_id, source FROM r WHERE rate >= 1.0 OR " +
        "substring(md5('mix-v1' || CAST(doc_id AS VARCHAR)), 1, 8) < " +
        "printf('%08x', CAST(least(floor(rate * 4294967296.0), 4294967295.0) AS BIGINT))) " +
        "SELECT source, count(*) AS n_kept, min(doc_id) AS min_id, max(doc_id) AS max_id " +
        "FROM k GROUP BY source ORDER BY source"),
      (s, dir) => {
        val rates = (0 to 4).map(i => s"src$i" -> 0.9) ++
          (5 to 9).map(i => s"src$i" -> 0.5)
        Curation.mixtureSample(Tables.documents(s, dir), col("doc_id"),
            "mix-v1", col("source"), rates, defaultRate = 0.15)
          .groupBy("source").agg(count(lit(1)).as("n_kept"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy("source")
      }),

    // ---- weighted sample without replacement (Efraimidis–Spirakis A-ES):
    // the 25 documents with the largest u^(1/n_chars) priority, u uniform
    // from md5('es-v1' ++ doc_id) — exact-count importance sampling, the
    // companion of q57's per-group fractions. Priorities round to 9dp with
    // the id-string tiebreak so selection is stable under last-ulp pow
    // differences between libms; the oracle rebuilds the identical draw.
    Q("q90_weighted_sample",
      Some("WITH d AS (SELECT doc_id, n_chars, " +
        "(CAST(('0x' || substring(md5('es-v1' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5) " +
        "/ 4294967296.0 AS u FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0), " +
        "p AS (SELECT doc_id, n_chars, " +
        "round(pow(u, 1.0 / CAST(n_chars AS DOUBLE)), 9) AS pr FROM d), " +
        "s AS (SELECT doc_id, n_chars FROM p " +
        "ORDER BY pr DESC, CAST(doc_id AS VARCHAR) ASC LIMIT 25) " +
        "SELECT doc_id, n_chars FROM s ORDER BY doc_id"),
      (s, dir) => Curation.weightedSample(
          Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
          col("doc_id"), "es-v1", col("n_chars"), 25)
        .orderBy("doc_id")),

    // ---- token-window chunking with overlap (RAG / context prep): window
    // 64, stride 48 → 16-token overlap. Pure row-local explode; chunk
    // content travels as an md5, never as text. DuckDB list slices are
    // INCLUSIVE: toks[a : a+63] is 64 tokens, clamped at the tail exactly
    // like Spark's slice().
    Q("q58_chunk",
      Some("WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
        "c AS (SELECT doc_id, toks, unnest(range(0, 1 + greatest(0, CAST(ceil((len(toks) - 64) / 48.0) AS INTEGER)))) AS chunk_id FROM t) " +
        // CAST to INTEGER: dtype parity, cf. q55 note
        "SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id, CAST(chunk_id * 48 + 1 AS INTEGER) AS tok_start, " +
        "CAST(len(toks[(chunk_id * 48 + 1):(chunk_id * 48 + 64)]) AS INTEGER) AS n_tokens, " +
        "md5(array_to_string(toks[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' ')) AS chunk_hash " +
        "FROM c ORDER BY doc_id, chunk_id"),
      (s, dir) => Curation.chunkByTokens(Tables.documents(s, dir),
          "doc_id", "text", window = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")),

    // ---- C4-style boilerplate line filtering: the corpus is single-line
    // word soup, so both engines build the SAME deterministic multi-line
    // document (content line + nav-bar line + parity-punctuated line +
    // lorem/brace lines keyed on doc_id) and then run the line pass — the
    // oracle checks token gating, the terminal-punctuation regex, kept-line
    // reassembly (via md5), and the doc-level keep decision end-to-end.
    Q("q59_boilerplate",
      Some("WITH a AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
        "b AS (SELECT doc_id, array_to_string(toks[1:10], ' ') || '.' || chr(10) || " +
        "'Home | About | Contact' || chr(10) || " +
        // coalesce: a fully out-of-range DuckDB list slice is NULL, where
        // Spark's slice() is an empty array (docs with exactly 10 tokens)
        "coalesce(array_to_string(toks[11:22], ' '), '') || (CASE WHEN doc_id % 2 = 0 THEN '!' ELSE '' END) || chr(10) || " +
        "(CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum dolor' ELSE 'The quick brown fox jumps high.' END) || chr(10) || " +
        "(CASE WHEN doc_id % 11 = 0 THEN 'function() { return 1; }' ELSE 'A tidy closing sentence ends here.' END) AS aug FROM a), " +
        "k AS (SELECT doc_id, aug, string_split(aug, chr(10)) AS lines, " +
        "[l for l in string_split(aug, chr(10)) if len(regexp_split_to_array(trim(l), '\\s+')) >= 5 " +
        "AND regexp_matches(l, '[.!?\"'']\\s*$')] AS kept FROM b) " +
        // CAST to INTEGER: dtype parity, cf. q55 note
        "SELECT doc_id, CAST(len(lines) AS INTEGER) AS n_lines, CAST(len(kept) AS INTEGER) AS n_kept_lines, " +
        "md5(array_to_string(kept, chr(10))) AS kept_hash, " +
        "(len(kept) >= 2 AND NOT contains(lower(aug), 'lorem ipsum') AND NOT contains(aug, '{')) AS keep " +
        "FROM k ORDER BY doc_id"),
      (s, dir) => {
        val toks = TA.tokens(col("text"))
        val aug = concat_ws("\n",
          concat(concat_ws(" ", slice(toks, 1, 10)), lit(".")),
          lit("Home | About | Contact"),
          concat(concat_ws(" ", slice(toks, 11, 12)),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("!")).otherwise(lit(""))),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("lorem ipsum dolor"))
            .otherwise(lit("The quick brown fox jumps high.")),
          when(pmod(col("doc_id"), lit(11)) === 0, lit("function() { return 1; }"))
            .otherwise(lit("A tidy closing sentence ends here.")))
        Curation.boilerplateStats(
          Tables.documents(s, dir).withColumn("aug", aug), "doc_id", "aug",
          minTokens = 5, minKeptLines = 2)
          .orderBy("doc_id")
      }),

    // ---- per-group (domain) capping: keep the 12 docs per source with the
    // smallest md5 draw. The oracle runs the SEMANTICS (plain rank <= k);
    // Spark runs the scale path (count-driven hash cutoff + under-fill
    // rescue) — hash equality proves the optimized plan exact.
    Q("q62_domain_cap",
      Some("WITH r AS (SELECT doc_id, source, lang, row_number() OVER (" +
        "PARTITION BY source ORDER BY substring(md5('cap-v1' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rnk " +
        "FROM documents) " +
        "SELECT source, doc_id, lang FROM r WHERE rnk <= 12 ORDER BY source, doc_id"),
      (s, dir) => Curation.capPerGroup(Tables.documents(s, dir),
          "source", "doc_id", "cap-v1", k = 12)
        .select(col("source"), col("doc_id"), col("lang"))
        .orderBy("source", "doc_id")),

    // ---- per-group top-k by score: the 8 highest-quality docs per source
    // (ties to the smaller doc_id). Spark runs the approx-percentile prune
    // + exactness rescue; the oracle runs the naive window rank — hash
    // equality proves the pruned plan exact and sketch-order-invariant.
    // The quality formula is q25's, rebuilt here over (doc_id, source).
    Q("q67_top_per_group",
      Some("WITH m AS (SELECT doc_id, source, " +
        s"CAST(len($ltokensSql) AS DOUBLE) AS nt, " +
        "CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio, " +
        s"CAST(len(list_filter($ltokensSql, x -> x IN ('the', 'a', 'an', 'of', 'and', 'or', 'is', 'are', 'in', 'on', 'to', 'for', 'with', 'as', 'by', 'at', 'it', 'this', 'that'))) AS DOUBLE) / len($ltokensSql) AS stop_ratio, " +
        s"CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\\s+')) AS mtl " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, source, " +
        "round(least(nt / 50.0, 1.0) * 0.3 + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 + " +
        "least(stop_ratio * 5.0, 1.0) * 0.3 + (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality " +
        "FROM m), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rnk FROM sc) " +
        "SELECT source, doc_id, quality FROM r WHERE rnk <= 8 ORDER BY source, doc_id"),
      (s, dir) => {
        val scored = Tables.documents(s, dir).select(col("doc_id"), col("source"),
          TA.qualityScore(col("text")).as("quality"))
        Curation.topKPerGroup(scored, "source", "quality", "doc_id", k = 8)
          .select(col("source"), col("doc_id"), col("quality"))
          .orderBy("source", "doc_id")
      }),

    // ---- corpus-frequency line dedup (RefinedWeb-style): both engines
    // build the same 4-line docs — two unique content lines plus a
    // per-source copyright footer (~25 docs each) and a global subscribe
    // prompt (500 docs); with maxDocs=10 both boilerplate lines must be
    // found and stripped from every document.
    Q("q63_line_dedup",
      Some("WITH a AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
        "b AS (SELECT doc_id, coalesce(array_to_string(toks[1:8], ' '), '') || '.' || chr(10) || " +
        "'Copyright 2024 ' || source || ' all rights reserved.' || chr(10) || " +
        "'Subscribe to our newsletter today!' || chr(10) || " +
        "coalesce(array_to_string(toks[9:16], ' '), '') || '.' AS aug FROM a), " +
        "l AS (SELECT doc_id, unnest(list_distinct(string_split(aug, chr(10)))) AS line FROM b), " +
        "freq AS (SELECT line, count(*) AS nd FROM l GROUP BY 1), " +
        "boiler AS (SELECT line FROM freq WHERE nd > 10), " +
        "bl AS (SELECT coalesce(list(line), []) AS blist FROM boiler), " +
        "k AS (SELECT doc_id, string_split(aug, chr(10)) AS lines, " +
        "list_filter(string_split(aug, chr(10)), x -> NOT list_contains(bl.blist, x)) AS kept FROM b, bl) " +
        // CAST to INTEGER: dtype parity, cf. q55 note
        "SELECT doc_id, CAST(len(lines) AS INTEGER) AS n_lines, CAST(len(lines) - len(kept) AS INTEGER) AS n_removed, " +
        "md5(array_to_string(kept, chr(10))) AS cleaned_hash FROM k ORDER BY doc_id"),
      (s, dir) => {
        val toks = TA.tokens(col("text"))
        val aug = concat_ws("\n",
          concat(concat_ws(" ", slice(toks, 1, 8)), lit(".")),
          concat(lit("Copyright 2024 "), col("source"), lit(" all rights reserved.")),
          lit("Subscribe to our newsletter today!"),
          concat(concat_ws(" ", slice(toks, 9, 8)), lit(".")))
        Curation.dedupLines(
          Tables.documents(s, dir).withColumn("aug", aug), "doc_id", "aug",
          maxDocs = 10)
          .orderBy("doc_id")
      }),

    // ---- Gopher duplicate-n-gram character fractions (the all-duplicates
    // companion of q54's top-gram rule): both engines append the same
    // planted repetition to every third doc and must agree on the char
    // fraction covered by 2-gram and 5-gram duplicates. Row-local sorted
    // run-length folds — zero shuffle.
    Q("q79_dup_ngrams", {
      def dupSql(n: Int) =
        s"(SELECT doc_id, coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) END), 0) AS dup " +
          s"FROM (SELECT doc_id, gram, count(*) AS cnt FROM " +
          s"(SELECT doc_id, unnest(grams) AS gram FROM (SELECT doc_id, ${ngramsAllSql(n)} AS grams FROM a) ig) ug " +
          "GROUP BY 1, 2) cg GROUP BY 1)"
      Some("WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 " +
        "THEN ' the quick fox jumps over the quick fox jumps over the quick fox jumps over' " +
        "ELSE ' plain tail words here' END AS text FROM documents) " +
        s"SELECT a.doc_id, round(CAST(d2.dup AS DOUBLE) / length($normSql), 6) AS dup2_frac, " +
        s"round(CAST(d5.dup AS DOUBLE) / length($normSql), 6) AS dup5_frac " +
        s"FROM a JOIN ${dupSql(2)} d2 ON a.doc_id = d2.doc_id " +
        s"JOIN ${dupSql(5)} d5 ON a.doc_id = d5.doc_id ORDER BY a.doc_id")
    },
      (s, dir) => {
        val aug = concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit(" the quick fox jumps over the quick fox jumps over the quick fox jumps over"))
            .otherwise(lit(" plain tail words here")))
        Tables.documents(s, dir).withColumn("aug", aug)
          .select(col("doc_id"),
            Curation.dupNgramCharFraction(col("aug"), 2).as("dup2_frac"),
            Curation.dupNgramCharFraction(col("aug"), 5).as("dup5_frac"))
          .orderBy("doc_id")
      }),

    // ---- duplicated-passage detection (exact >=50-token shared-run rule,
    // stride 1): both engines append the same 60-token passage to every
    // fourth doc AT A DIFFERENT OFFSET per doc (the soup prefix varies),
    // so detection must be alignment-independent — each planted doc yields
    // exactly the 11 windows fully inside the shared run, all carried by
    // every planted doc.
    Q("q80_dup_passages", {
      val passage = (1 to 60).map(i => f"ptok$i%02d").mkString(" ")
      Some("WITH a AS (SELECT doc_id, trim(text) || ' ' || " +
        s"(CASE WHEN doc_id % 4 = 0 THEN '$passage' ELSE 'tailword unique end' END) AS text FROM documents), " +
        "t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM a), " +
        "w0 AS (SELECT doc_id, CASE WHEN len(toks) < 50 THEN [] " +
        "ELSE [md5(array_to_string(toks[i:i+49], ' ')) for i in range(1, len(toks) - 48)] END AS hs FROM t), " +
        "w AS (SELECT doc_id, unnest(range(1, 1 + len(hs))) AS tok_start, unnest(hs) AS chunk_hash FROM w0), " +
        "f AS (SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY 1) " +
        // CAST to INTEGER: dtype parity, cf. q55 note
        "SELECT w.doc_id, CAST(w.tok_start AS INTEGER) AS tok_start, w.chunk_hash, f.n_docs " +
        "FROM w JOIN f USING (chunk_hash) WHERE f.n_docs >= 2 " +
        "ORDER BY doc_id, tok_start")
    },
      (s, dir) => {
        val passage = (1 to 60).map(i => f"ptok$i%02d").mkString(" ")
        val aug = concat(trim(col("text")), lit(" "),
          when(pmod(col("doc_id"), lit(4)) === 0, lit(passage))
            .otherwise(lit("tailword unique end")))
        Curation.duplicatePassages(
          Tables.documents(s, dir).withColumn("aug", aug), "doc_id", "aug",
          window = 50, stride = 1, minDocs = 2)
          .orderBy("doc_id", "tok_start")
      }),

    // ---- CCNet-style sentence-level corpus dedup: dedupSegments with the
    // q77 sentence splitter. Both engines build 4-sentence paragraphs where
    // a global subscribe prompt (500 docs) and a per-source copyright
    // (~25 docs each) clear maxDocs=10 and must be stripped from every
    // document; the two content sentences stay.
    Q("q78_sentence_dedup",
      Some(s"WITH a AS (SELECT doc_id, source, $ltokensSql AS toks FROM documents), " +
        "b AS (SELECT doc_id, coalesce(array_to_string(toks[1:8], ' '), '') || '. ' || " +
        "'Subscribe to our newsletter today! ' || " +
        "'Copyright 2024 ' || source || ' all rights reserved. ' || " +
        "coalesce(array_to_string(toks[9:16], ' '), '') || '.' AS para FROM a), " +
        "l AS (SELECT doc_id, list_filter(list_transform(" +
        "regexp_split_to_array(para, '[.!?]+\\s+'), " +
        "x -> trim(regexp_replace(x, '[.!?]+\\s*$', ''))), x -> x != '') AS ss FROM b), " +
        "e AS (SELECT doc_id, unnest(list_distinct(ss)) AS seg FROM l), " +
        "freq AS (SELECT md5(seg) AS lh, count(*) AS nd FROM e GROUP BY 1), " +
        "boiler AS (SELECT lh FROM freq WHERE nd > 10), " +
        "bl AS (SELECT coalesce(list(lh), []) AS blist FROM boiler), " +
        "k AS (SELECT doc_id, ss, list_filter(ss, x -> NOT list_contains(bl.blist, md5(x))) AS kept FROM l, bl) " +
        // CAST to INTEGER: dtype parity, cf. q55 note
        "SELECT doc_id, CAST(len(ss) AS INTEGER) AS n_segments, CAST(len(ss) - len(kept) AS INTEGER) AS n_removed, " +
        "md5(array_to_string(kept, chr(10))) AS cleaned_hash FROM k ORDER BY doc_id"),
      (s, dir) => {
        val toks = TA.tokens(lower(col("text")))
        val para = concat(
          concat_ws(" ", slice(toks, 1, 8)), lit(". "),
          lit("Subscribe to our newsletter today! "),
          lit("Copyright 2024 "), col("source"), lit(" all rights reserved. "),
          concat_ws(" ", slice(toks, 9, 8)), lit("."))
        Curation.dedupSegments(
          Tables.documents(s, dir).withColumn("para", para), "doc_id", "para",
          TA.sentences, maxDocs = 10)
          .orderBy("doc_id")
      }),

    // ---- Gopher document-quality rules: both engines build the same
    // deterministic multi-line augmentation (bullet lines on %4, ellipsis
    // ending on %6, hash noise on %9) so every rule's signal varies, then
    // compute word/line/symbol stats and the composite keep decision with
    // identical arithmetic. All row-local.
    Q("q74_gopher_quality",
      Some("WITH a AS (SELECT doc_id, text || chr(10) || " +
        "(CASE WHEN doc_id % 4 = 0 THEN '• bullet item one' || chr(10) || '• bullet item two' " +
        "ELSE 'a plain continuation line here.' END) || chr(10) || " +
        "(CASE WHEN doc_id % 6 = 0 THEN 'to be continued ...' ELSE 'final closing line.' END) || chr(10) || " +
        "(CASE WHEN doc_id % 9 = 0 THEN '### heading ## tags #' ELSE 'regular words only' END) AS aug " +
        "FROM documents), " +
        "m AS (SELECT doc_id, aug, " +
        "list_filter(regexp_split_to_array(trim(lower(aug)), '\\s+'), x -> x != '') AS toks, " +
        "string_split(aug, chr(10)) AS lines FROM a), " +
        // CAST to INTEGER: dtype parity, cf. q55 note
        "s AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_words, " +
        "round(CAST(length(regexp_replace(trim(aug), '\\s+', '', 'g')) AS DOUBLE) / len(toks), 6) AS mean_word_len, " +
        "round(((length(aug) - length(replace(aug, '#', ''))) + " +
        "(length(aug) - length(replace(aug, '...', ''))) / 3) / len(toks), 6) AS symbol_ratio, " +
        "round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE) / len(lines), 6) AS bullet_line_frac, " +
        "round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE) / len(lines), 6) AS ellipsis_line_frac, " +
        "round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(toks), 6) AS alpha_word_frac, " +
        "CAST(len(list_intersect(list_distinct(toks), ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS INTEGER) AS n_required_words " +
        "FROM m) " +
        "SELECT *, (n_words >= 50 AND n_words <= 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0 " +
        "AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3 " +
        "AND alpha_word_frac >= 0.8 AND n_required_words >= 2) AS keep " +
        "FROM s ORDER BY doc_id"),
      (s, dir) => {
        val aug = concat_ws("\n",
          col("text"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit("• bullet item one\n• bullet item two"))
            .otherwise(lit("a plain continuation line here.")),
          when(pmod(col("doc_id"), lit(6)) === 0, lit("to be continued ..."))
            .otherwise(lit("final closing line.")),
          when(pmod(col("doc_id"), lit(9)) === 0, lit("### heading ## tags #"))
            .otherwise(lit("regular words only")))
        Curation.gopherQuality(
          Tables.documents(s, dir).withColumn("aug", aug), "doc_id", "aug")
          .orderBy("doc_id")
      }),

    // ---- domain-blocklist filtering (UT1-style): a host is blocked when
    // it IS a listed domain or sits anywhere UNDER one (never substring
    // matching: src3.org must not block notsrc3.org). One list entry per
    // synthetic URL family: subdomain-of-listed (www.src7-news.example.com
    // under src7-news.example.com), registrable under a two-level public
    // suffix (blog.src1.co.uk under src1.co.uk), exact apex (src3.org),
    // exact IPv4 literal, and cdn subdomain (cdn-N.src2.io under src2.io).
    // The oracle is the naive NOT EXISTS with ends_with; the Spark side
    // must reach the identical survivor set through the distinct-host
    // suffix-explode equi join (a LIKE join would be a nested loop).
    Q("q88_domain_blocklist",
      Some("WITH u AS (SELECT doc_id, " + synthUrlSql + " AS url FROM documents), " +
        "h AS (SELECT doc_id, " +
        "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host FROM u), " +
        "b(dom) AS (VALUES ('src3.org'), ('src7-news.example.com'), " +
        "('src1.co.uk'), ('192.168.17.7'), ('src2.io')) " +
        "SELECT doc_id, host FROM h WHERE NOT EXISTS " +
        "(SELECT 1 FROM b WHERE h.host = b.dom OR ends_with(h.host, '.' || b.dom)) " +
        "ORDER BY doc_id"),
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
          .withColumn("url", synthUrl)
        val bl = Seq("src3.org", "src7-news.example.com", "src1.co.uk",
          "192.168.17.7", "src2.io").toDF("dom")
        Web.domainBlocklistFilter(docs, "url", bl, "dom")
          .select(col("doc_id"), Web.urlHost(col("url")).as("host"))
          .orderBy("doc_id")
      }),

    // ---- URL decomposition (scheme/host/registered domain/path): both
    // engines build the same deterministic URL mix — www hosts, co.uk
    // two-level suffix with userinfo + port, bare two-label hosts, IPv4
    // literals, cdn subdomains — and run the identical RE2 patterns + PSL
    // rules. The registered domain is the per-domain capping key at web
    // scale (Curation.capPerGroup on it); everything is row-local.
    Q("q71_url_parts", {
      val sfx = Web.TwoLevelSuffixes.map(x => s"'$x'").mkString("(", ", ", ")")
      val host = "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))"
      Some("WITH u AS (SELECT doc_id, " + synthUrlSql + " AS url " +
        "FROM documents), " +
        "h AS (SELECT doc_id, " +
        "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme, " +
        s"$host AS host, " +
        "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path " +
        "FROM u) " +
        "SELECT doc_id, scheme, host, CASE " +
        "WHEN regexp_matches(host, '^\\d{1,3}(\\.\\d{1,3}){3}$') THEN host " +
        "WHEN len(string_split(host, '.')) <= 2 THEN host " +
        s"WHEN array_to_string(string_split(host, '.')[-2:], '.') IN $sfx " +
        "THEN array_to_string(string_split(host, '.')[-3:], '.') " +
        "ELSE array_to_string(string_split(host, '.')[-2:], '.') END AS registered_domain, " +
        "path FROM h ORDER BY doc_id")
    },
      (s, dir) => {
        Web.withUrlParts(
            Tables.documents(s, dir).select(col("doc_id"), col("source"))
              .withColumn("url", synthUrl), "url")
          .select(col("doc_id"), col("scheme"), col("host"),
            col("registered_domain"), col("path"))
          .orderBy("doc_id")
      }),

    // ---- canonical-URL dedup: the same page reached via campaign links,
    // fragments, default ports, userinfo, and re-ordered query strings
    // collapses to ONE canonical key. Both engines build two byte-distinct
    // variants per doc (plus one genuinely unique URL) and must agree on
    // the canonical form, the variant count, and the keeper id.
    Q("q75_url_dedup", {
      val scheme = "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
      val host = "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))"
      val port = "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:(\\d+)', 1)"
      val path = "regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), '/+$', '')"
      val qs = "array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), '&'), " +
        "p -> p != '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid|ref)(=|$)'))), '&')"
      Some("WITH v AS (" +
        "SELECT doc_id, 'https://WWW.' || source || '.example.com:443/page/' || doc_id || '/?utm_source=x&b=2&a=1#top' AS url FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, 'https://user@www.' || source || '.example.com/page/' || doc_id || '?a=1&b=2&fbclid=zzz' FROM documents " +
        "UNION ALL SELECT doc_id + 2000000, 'http://' || source || '.net/item?id=' || doc_id FROM documents), " +
        s"c AS (SELECT doc_id, $scheme AS scheme, $host AS host, $port AS port, $path AS path, $qs AS qs FROM v), " +
        "n AS (SELECT doc_id, scheme || '://' || host || " +
        "(CASE WHEN port != '' AND NOT (scheme = 'http' AND port = '80') AND NOT (scheme = 'https' AND port = '443') THEN ':' || port ELSE '' END) " +
        "|| path || (CASE WHEN qs != '' THEN '?' || qs ELSE '' END) AS canonical FROM c) " +
        "SELECT canonical, count(*) AS n_variants, min(doc_id) AS keep_id " +
        "FROM n GROUP BY canonical ORDER BY keep_id")
    },
      (s, dir) => {
        val base = Tables.documents(s, dir).select(col("doc_id"), col("source"))
        def v(shift: Long, url: Column) =
          base.select((col("doc_id") + lit(shift)).as("doc_id"), url.as("url"))
        val variants =
          v(0L, concat(lit("https://WWW."), col("source"),
            lit(".example.com:443/page/"), col("doc_id"),
            lit("/?utm_source=x&b=2&a=1#top"))).union(
          v(1000000L, concat(lit("https://user@www."), col("source"),
            lit(".example.com/page/"), col("doc_id"),
            lit("?a=1&b=2&fbclid=zzz")))).union(
          v(2000000L, concat(lit("http://"), col("source"),
            lit(".net/item?id="), col("doc_id"))))
        variants.groupBy(Web.normalizeUrl(col("url")).as("canonical"))
          .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keep_id"))
          .orderBy("keep_id")
      }),

    // ---- incremental corpus delta: previous snapshot = current minus the
    // doc_id%7 slice (-> added), with the %5 slice amended (-> changed),
    // plus an id-shifted extra slice (-> removed); everything else
    // unchanged. One id-keyed full-outer join of (id, fp) relations — the
    // primitive that lets a re-crawl re-curate only what moved.
    Q("q73_corpus_delta",
      Some("WITH cur AS (SELECT doc_id, md5(" + normSql + ") AS fp_current FROM documents), " +
        "p0 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' amended' ELSE text END AS text " +
        "FROM documents WHERE doc_id % 7 != 0 " +
        "UNION ALL SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 11 = 0), " +
        "prev AS (SELECT doc_id, md5(" + normSql + ") AS fp_previous FROM p0), " +
        "j AS (SELECT coalesce(cur.doc_id, prev.doc_id) AS doc_id, fp_current, fp_previous " +
        "FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id) " +
        "SELECT doc_id, CASE WHEN fp_previous IS NULL THEN 'added' " +
        "WHEN fp_current IS NULL THEN 'removed' " +
        "WHEN fp_current = fp_previous THEN 'unchanged' ELSE 'changed' END AS status, " +
        "fp_current, fp_previous FROM j ORDER BY doc_id"),
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val previous = d.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(col("text"), lit(" amended"))).otherwise(col("text")).as("text"))
          .union(d.filter(pmod(col("doc_id"), lit(11)) === 0)
            .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text")))
        Curation.corpusDelta(d, previous, "doc_id", "text")
          .orderBy("doc_id")
      }),

    // ---- duplicate-cluster size distribution over the q26 doubled corpus
    // (every text appears exactly twice -> all mass at even sizes): the
    // dedup-planning histogram; content never shuffles, only fingerprints.
    Q("q131_dup_sizes",
      Some("WITH corpus AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents), " +
        s"c AS (SELECT md5($normSql) AS fp, count(*) AS cluster_size " +
        "FROM corpus GROUP BY 1) " +
        "SELECT cluster_size, count(*) AS n_clusters, " +
        "cluster_size * count(*) AS n_docs FROM c GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val corpus = d.union(
          d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Dedup.dupClusterSizes(corpus, "text").orderBy("cluster_size")
      }),

    // ---- cross-source content overlap: every third doc mirrors into a
    // 'mirror_<source>' label, so each source shares ~1/3 of its content
    // with its mirror; the (source, fingerprint) relation self-joins
    // co-keyed on the fingerprint — text never joins.
    Q("q132_content_overlap",
      Some("WITH corpus AS (SELECT source, text FROM documents " +
        "UNION ALL SELECT 'mirror_' || source, text FROM documents WHERE doc_id % 3 = 0), " +
        s"b AS (SELECT DISTINCT source AS g, md5($normSql) AS fp FROM corpus), " +
        "s AS (SELECT g, count(*) AS n FROM b GROUP BY 1), " +
        "p AS (SELECT x.g AS src_a, y.g AS src_b, count(*) AS n_shared " +
        "FROM b x JOIN b y ON x.fp = y.fp AND x.g < y.g GROUP BY 1, 2) " +
        "SELECT src_a, src_b, n_shared, " +
        "round(n_shared / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6) AS jaccard " +
        "FROM p JOIN s sa ON src_a = sa.g JOIN s sb ON src_b = sb.g " +
        "ORDER BY 1, 2"),
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("source"), col("text"))
        val corpus = d.union(Tables.documents(s, dir)
          .filter(pmod(col("doc_id"), lit(3)) === 0)
          .select(concat(lit("mirror_"), col("source")).as("source"), col("text")))
        Dedup.contentOverlapMatrix(corpus, "source", "text")
          .orderBy("src_a", "src_b")
      }),

    // ---- deterministic budget-greedy corpus trim: per shard (id % 8 -
    // the packSequences scale contract), best-lexical-diversity-first
    // while the exclusive running token sum stays under budget/8. A doc
    // survives iff everything strictly better in its shard left room -
    // one per-shard window, no global sort.
    Q("q222_budget_trim",
      Some("WITH t AS (SELECT doc_id, " + ltokensSql + " AS tk FROM documents), " +
        "s AS (SELECT doc_id, round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS score, " +
        "CAST(len(tk) AS BIGINT) AS ntok FROM t), " +
        "r AS (SELECT doc_id AS id, doc_id % 8 AS shard, ntok AS weight, score, " +
        "sum(ntok) OVER (PARTITION BY doc_id % 8 ORDER BY score DESC, doc_id " +
        "ROWS UNBOUNDED PRECEDING) - ntok AS excl_sum FROM s) " +
        "SELECT id, shard, weight, score FROM r WHERE excl_sum < 3125 ORDER BY id"),
      (s, dir) => {
        val tk = split(trim(lower(col("text"))), "\\s+")
        Curation.trimToBudget(Tables.documents(s, dir), "doc_id",
            size(tk).cast("long"),
            round(size(array_distinct(tk)).cast("double") / size(tk), 6),
            budget = 25000L, numShards = 8)
          .orderBy("id")
      }),

    // ---- quality-curriculum source interleave: rank within source by
    // (diversity DESC, id); ordering by (rank, source) round-robins the
    // sources front-loaded with their best docs. The rank is one
    // source-keyed window; the global order stays a SORT KEY (range
    // partition at write time), never a computed global position.
    Q("q223_curriculum",
      Some("WITH t AS (SELECT doc_id, source, " + ltokensSql + " AS tk FROM documents), " +
        "s AS (SELECT doc_id, source, round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS score FROM t) " +
        "SELECT doc_id AS id, source, score, " +
        "CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rank_in_source " +
        "FROM s ORDER BY rank_in_source, source, id"),
      (s, dir) => {
        val tk = split(trim(lower(col("text"))), "\\s+")
        Curation.curriculumInterleave(Tables.documents(s, dir), "doc_id",
            "source",
            round(size(array_distinct(tk)).cast("double") / size(tk), 6))
          .select(col("id"), col("source"), col("score"),
            col("rank_in_source").cast("long").as("rank_in_source"))
          .orderBy("rank_in_source", "source", "id")
      }),

    // ---- largest-remainder eval-set apportionment: 1000 eval slots
    // proportional to source size, Σ alloc = 1000 EXACT (integer quotas,
    // leftover seats to the largest remainders, ties to the smaller
    // source). Windows run over the |sources| relation only.
    Q("q227_eval_allocation",
      Some("WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows FROM documents GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS N FROM c), " +
        "b AS (SELECT source, n_rows, CAST((n_rows * 1000) // N AS BIGINT) AS base, " +
        "(n_rows * 1000) % N AS rem FROM c, t), " +
        "r AS (SELECT source, n_rows, base, row_number() OVER (ORDER BY rem DESC, source) AS rk, " +
        "(SELECT 1000 - sum(base) FROM b) AS leftover FROM b) " +
        "SELECT source, n_rows, CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS n_alloc " +
        "FROM r ORDER BY source"),
      (s, dir) => Curation.allocateEvalSet(Tables.documents(s, dir), "source",
          k = 1000L)
        .orderBy("source")),

    // ---- canonical-URL normalization: case folding, userinfo/default-port
    // /fragment drop, tracking-param strip, residual params SORTED — the
    // dedup key of web-scale URL dedup (q75 dedups raw; this is the grain a
    // crawl actually uses). Four synthetic variants exercise every branch;
    // both engines run the identical RE2 regexes and list pipeline.
    Q("q268_url_canonical", {
      val urlSql = "CASE doc_id % 4 " +
        "WHEN 0 THEN 'HTTPS://Example.COM:443/a/' || doc_id || " +
        "'?utm_source=' || source || '&b=2&a=1#frag' " +
        "WHEN 1 THEN 'http://user:pw@Blog.Example.org:80/p/' || doc_id || " +
        "'?gclid=1&z=9&y=' || doc_id " +
        "WHEN 2 THEN 'https://cdn.example.io:8443/x/' || doc_id " +
        "ELSE 'http://Example.net?ref=' || doc_id END"
      Some("WITH u AS (SELECT doc_id, " + urlSql + " AS url FROM documents), " +
        "p AS (SELECT doc_id, " +
        "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme, " +
        "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host, " +
        "coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:(\\d+)', 1), '') AS port, " +
        "coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), '') AS path, " +
        "coalesce(regexp_extract(url, '\\?([^#]*)', 1), '') AS q FROM u), " +
        "k AS (SELECT doc_id, scheme, host, port, path, " +
        "coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'), " +
        "x -> len(x) > 0 AND NOT regexp_matches(x, " +
        "'^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)='))), '&'), '') AS qs FROM p) " +
        "SELECT doc_id, scheme || '://' || host || " +
        "CASE WHEN port = '' OR (scheme = 'http' AND port = '80') " +
        "OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END || " +
        "CASE WHEN path = '' THEN '/' ELSE path END || " +
        "CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical_url " +
        "FROM k ORDER BY doc_id")
    },
      (s, dir) => {
        val url = when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("HTTPS://Example.COM:443/a/"), col("doc_id"),
              lit("?utm_source="), col("source"), lit("&b=2&a=1#frag")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit("http://user:pw@Blog.Example.org:80/p/"), col("doc_id"),
              lit("?gclid=1&z=9&y="), col("doc_id")))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit("https://cdn.example.io:8443/x/"), col("doc_id")))
          .otherwise(concat(lit("http://Example.net?ref="), col("doc_id")))
        Web.withCanonicalUrl(
            Tables.documents(s, dir).select(col("doc_id"), col("source"))
              .withColumn("url", url), "url")
          .select("doc_id", "canonical_url")
          .orderBy("doc_id")
      }),

    // ---- packing-efficiency report over q52's GPT-style sequence packer:
    // per shard, how full the fixed-budget sequences actually are
    // (utilization), and how many documents span a sequence boundary —
    // the wasted-compute / attention-contamination readout every packed
    // training run needs before committing GPU hours.
    Q("q378_packing_efficiency", {
      val tokensSql = """regexp_split_to_array(trim(text), '\s+')"""
      Some("WITH t AS (SELECT doc_id AS id, doc_id % 8 AS shard, " +
        s"CAST(len($tokensSql) AS INTEGER) AS nt FROM documents), " +
        "c AS (SELECT id, shard, nt, CAST(sum(nt) OVER (PARTITION BY " +
        "shard ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT " +
        "ROW) AS BIGINT) - nt AS ts FROM t), " +
        "p AS (SELECT shard, nt, ts, CAST(floor(ts / 256.0) AS BIGINT) " +
        "AS seq FROM c) " +
        "SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(max(seq) + 1 AS BIGINT) AS n_seqs, " +
        "CAST(sum(nt) AS BIGINT) AS total_tokens, " +
        "CAST(sum(CASE WHEN nt > 0 AND CAST(floor((ts + nt - 1) / 256.0) " +
        "AS BIGINT) <> seq THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning, " +
        "round(CAST(sum(nt) AS DOUBLE) / CAST((max(seq) + 1) * 256 " +
        "AS DOUBLE), 6) AS utilization " +
        "FROM p GROUP BY 1 ORDER BY 1")
    },
      (s, dir) => {
        val packed = Curation.packSequences(Tables.documents(s, dir),
          "doc_id", "text", tokenBudget = 256, numShards = 8)
        packed.groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            (max(col("seq_in_shard")) + lit(1L)).as("n_seqs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(when(col("n_tokens") > 0 &&
              floor((col("tok_start") + col("n_tokens") - lit(1L)) /
                lit(256.0)) =!= col("seq_in_shard"), 1L)
              .otherwise(0L)).as("n_spanning"))
          .select(col("shard"), col("n_docs"), col("n_seqs"),
            col("total_tokens"), col("n_spanning"),
            round(col("total_tokens").cast("double") /
              (col("n_seqs") * lit(256L)).cast("double"), 6)
              .as("utilization"))
          .orderBy("shard")
      })
  )
}
