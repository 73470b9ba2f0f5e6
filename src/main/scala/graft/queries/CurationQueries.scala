package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Curation

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
        s"SELECT doc_id, len(regexp_extract_all(aug, '$emailSql')) AS n_emails, " +
        s"len(regexp_extract_all(aug, '$ipSql')) AS n_ips, " +
        s"len(regexp_extract_all(aug, '$phoneSql')) AS n_phones, " +
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
      })
  )
}
