package graft

import org.apache.spark.sql.functions._

import graft.functions.UnicodeFns

/** Unicode normalization kernels: standard-form hand cases through the
  * codegen path (DataFrame select) and the SQL registration. Combining vs
  * precomposed forms are written as explicit \\u escapes — they render
  * identically. Cross-engine agreement with DuckDB (nfc_normalize /
  * strip_accents) is q83's oracle.
  */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val combining = "cafe\u0301"   // e + U+0301 combining acute
  private val precomposed = "caf\u00e9"  // U+00E9 precomposed é

  private def one(input: String, c: org.apache.spark.sql.Column): String =
    Seq(input).toDF("t").select(c.as("r")).collect().head.getString(0)

  test("NFC composes combining sequences; NFD decomposes; idempotent passthrough") {
    assert(one(combining, UnicodeFns.unicodeNormalize(col("t"), "NFC")) == precomposed)
    assert(one(precomposed, UnicodeFns.unicodeNormalize(col("t"), "NFD")) == combining)
    assert(one("plain ascii", UnicodeFns.unicodeNormalize(col("t"), "NFC")) == "plain ascii")
    assert(one(precomposed, UnicodeFns.unicodeNormalize(col("t"), "NFC")) == precomposed)
  }

  test("NFKC folds compatibility forms NFC leaves alone") {
    assert(one("ﬁsh", UnicodeFns.unicodeNormalize(col("t"), "NFKC")) == "fish")
    assert(one("ﬁsh", UnicodeFns.unicodeNormalize(col("t"), "NFC")) == "ﬁsh")
    assert(one("ＡBC", UnicodeFns.unicodeNormalize(col("t"), "NFKC")) == "ABC")
    assert(one("2²", UnicodeFns.unicodeNormalize(col("t"), "NFKC")) == "22")
    assert(one(combining, UnicodeFns.unicodeNormalize(col("t"), "NFKC")) == precomposed)
  }

  test("strip_accents folds diacritics, leaves non-accent decompositions alone") {
    assert(one(precomposed, UnicodeFns.stripAccents(col("t"))) == "cafe")
    assert(one(combining, UnicodeFns.stripAccents(col("t"))) == "cafe")
    assert(one("Ångstrom", UnicodeFns.stripAccents(col("t"))) == "Angstrom")
    assert(one("naïve ñ ç ü", UnicodeFns.stripAccents(col("t"))) == "naive n c u")
    assert(one("plain ascii", UnicodeFns.stripAccents(col("t"))) == "plain ascii")
    // ligature has no combining marks: untouched (strip folds accents,
    // it is not NFKC)
    assert(one("ﬁsh", UnicodeFns.stripAccents(col("t"))) == "ﬁsh")
  }

  test("null passthrough and invalid form rejection") {
    val r = Seq[String](null).toDF("t")
      .select(UnicodeFns.unicodeNormalize(col("t"), "NFKC").as("n"),
        UnicodeFns.stripAccents(col("t")).as("s")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val e = intercept[IllegalArgumentException] {
      UnicodeFns.unicodeNormalize(col("t"), "NFX")
    }
    assert(e.getMessage.contains("NFKC"))
  }

}
