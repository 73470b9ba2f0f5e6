package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface registered via SparkSessionExtensions. Separate session
  * (extensions apply at build time).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // extensions only apply at session creation: getOrCreate would silently
    // reuse the shared test session, so force a fresh one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("custom expressions callable from SQL") {
    val row = spark.sql(
      """SELECT CAST(lenient_date('2/32/82') AS STRING) AS d,
        |       lenient_time('2:00 pm') AS t,
        |       CAST(lenient_timestamp('spam') AS STRING) AS sentinel,
        |       round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS cos,
        |       dot_product(array(2.0d, 3.0d), array(4.0d, 5.0d)) AS dot,
        |       simhash64(array(xxhash64('a'), xxhash64('b'))) AS sh
        |""".stripMargin).head()
    assert(row.getString(0) == "1982-02-28")
    assert(row.getString(1) == "14:00:00")
    assert(row.getString(2) == "9999-12-31 00:00:00")
    assert(row.getDouble(3) == 1.0)
    assert(row.getDouble(4) == 23.0)
    assert(row.getLong(5) != 0L)
  }

  test("sketch/text kernels callable from SQL") {
    val row = spark.sql(
      """SELECT sort_array(word_shingles('The quick brown fox', 2)) AS sh,
        |       size(minhash_signature(array(struct(1L AS h1, 2L AS h2)), 8)) AS nsig,
        |       langid('the cat is in the house and it is warm') AS lang,
        |       langid('zzz qqq') AS und
        |""".stripMargin).head()
    assert(row.getSeq[String](0) == Seq("brown fox", "quick brown", "the quick"))
    assert(row.getInt(1) == 8)
    assert(row.getString(2) == "en")
    assert(row.getString(3) == "und")
  }

  test("unicode kernels callable from SQL") {
    val row = spark.sql(
      "SELECT unicode_normalize('ﬁsh Ａ', 'NFKC') AS a, " +
        "strip_accents('café Å') AS b").head()
    assert(row.getString(0) == "fish A")
    assert(row.getString(1) == "cafe A")
    // form must be a literal
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT unicode_normalize(t, t) FROM VALUES ('x') AS v(t)").collect()
    }
    assert(bad.getMessage.contains("foldable"),
      s"expected a foldable-input message, got: ${bad.getMessage}")
  }

  test("non-foldable / NULL literal args fail with a clear AnalysisException") {
    import org.apache.spark.sql.AnalysisException
    // column reference where a literal shingle width is required
    val nonFoldable = intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(t, n) FROM VALUES ('a b c', 2) AS v(t, n)").collect()
    }
    assert(nonFoldable.getMessage.contains("foldable"),
      s"expected a foldable-input message, got: ${nonFoldable.getMessage}")
    // NULL literal width
    val nullArg = intercept[AnalysisException] {
      spark.sql("SELECT minhash_signature(array(struct(1L AS h1, 2L AS h2)), NULL)").collect()
    }
    assert(nullArg.getMessage.contains("foldable") || nullArg.getMessage.contains("NULL"),
      s"expected a clear message, got: ${nullArg.getMessage}")
  }
}
