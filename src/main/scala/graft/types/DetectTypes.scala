package graft.types

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{DateParser, Lenient, LenientDatetimeExpr}

/** Streaming schema inference with confidence, the reference's
  * `process.detect_types` (meza/process.py:263-358) re-expressed for Spark:
  * the vote/merge/confidence logic runs on the driver over a bounded sample
  * (`df.limit(maxIter)` — one tiny job, the rest of the plan untouched), and
  * the resulting types drive a single `select` of cast expressions that runs
  * distributed at any scale.
  */
object DetectTypes {

  final case class FieldType(id: String, mezaType: String)
  final case class Result(types: Seq[FieldType], confidence: Double,
      count: Int, accurate: Boolean)

  // ---- value-level guess chain (typetools.py:85-171 guess_type_by_value) ---
  private[types] def guessByValue(v: String): String = {
    if (isNullStr(v)) "null"
    else if (isBoolStr(v)) "bool"
    else if (isIntStr(v)) "int"
    else if (isNumericStr(v)) "float"
    else if (DateParser.isDatetime(v)) "datetime"
    else if (isTimeGuess(v)) "time"
    else if (DateParser.isDate(v)) "date"
    else "text"
  }

  private def isNullStr(v: String): Boolean =
    v == null || Lenient.DefNulls.contains(v.toLowerCase) || v.trim.isEmpty

  private def isBoolStr(v: String): Boolean =
    (Lenient.DefTrues ++ Lenient.DefFalses).contains(v.toLowerCase)

  private def stripStr(v: String): String =
    v.filterNot(Lenient.Currencies.contains(_)).replace(",", "")

  private def isNumericStr(v: String): Boolean = {
    val s = stripStr(v)
    try {
      val f = s.toDouble
      if (s.matches("^0[0-9].*")) f == 0.0 else true
    } catch { case _: NumberFormatException => false }
  }

  private def isIntStr(v: String): Boolean = {
    val s = stripStr(v)
    isNumericStr(v) && (try s.toDouble.isWhole catch { case _: NumberFormatException => false })
  }

  /** typetools.is_time: literal time markers; guarded so pure dates with 'T'
    * can't double-count (the chain order already handles datetime first). */
  private def isTimeGuess(v: String): Boolean =
    DateParser.isTime(v) && DateParser.parse(v).exists(_._2.isDefined)

  // ---- name-level priors (typetools.py:36-81 guess_type_by_field) ----------
  def guessByField(name: String): String = {
    val n = name.toLowerCase
    val floatWords = Seq("value", "length", "width", "days")
    if (n.contains("count")) "int"
    else if (floatWords.exists(w => fuzzyContains(n, w))) "float"
    else if (n.contains("date") && n.contains("time")) "datetime"
    else if (n.contains("time")) "time"
    else if (n.contains("date")) "date"
    else "text"
  }

  /** fntools.find(method='fuzzy'): word-overlap containment. */
  private def fuzzyContains(name: String, word: String): Boolean =
    name.split("[^a-z0-9]+").exists(tok => tok.contains(word) || word.contains(tok) && tok.nonEmpty)

  // ---- confidence (process.py:161-200 gen_confidences) --------------------
  /** a·ln(1+n) / (1 + a·ln(1+n)), quantized to 2 places HALF_UP like the
    * reference (it rounds through to_decimal). */
  private[types] def confidence(n: Int, a: Int): Double = {
    val x = math.log1p(n.toDouble)
    BigDecimal(a * x / (1 + a * x)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Driver-side sampled inference. Works on any DataFrame; non-string
    * columns keep their Spark type vote ("already typed" short-circuit).
    */
  def detect(df: DataFrame, minConf: Double = 0.95, hweight: Int = 6,
             maxIter: Int = 100): Result = {
    require(hweight >= 1, "`hweight` must be greater than or equal to 1!")
    require(minConf < 1, "`min_conf` must be less than 1!")

    val fields = df.schema.fields
    val sample = df.limit(maxIter).collect()

    val tally = mutable.LinkedHashMap[String, mutable.Map[String, Int]]()
    // NOTE: the reference's header-prior pass (process.py:328-331) is dead
    // code — `ftypes` is a generator already consumed by the tally-init
    // comprehension, and `operator.iadd` on an int doesn't mutate the
    // defaultdict. Verified empirically against the reference: only value
    // votes tally; `hweight` acts solely as the confidence curve's `a`.
    // We reproduce the actual behavior, not the apparent intent.
    fields.foreach { f => tally(f.name) = mutable.Map.empty[String, Int] }

    var conf = 0.0
    var count = 0
    var types: Seq[FieldType] = Nil

    val it = sample.iterator
    var converged = false
    while (it.hasNext && !converged) {
      val row = it.next()
      fields.zipWithIndex.foreach { case (f, i) =>
        val guess = f.dataType match {
          case StringType => guessByValue(if (row.isNullAt(i)) null else row.getString(i))
          case _ if row.isNullAt(i) => "null"
          case BooleanType => "bool"
          case _: IntegerType | LongType | ShortType | ByteType => "int"
          case _: FloatType | DoubleType => "float"
          case _: DecimalType => "decimal"
          case DateType => "date"
          case TimestampType => "datetime"
          case _ => "text"
        }
        val m = tally(f.name)
        m(guess) = m.getOrElse(guess, 0) + 1
      }
      count += 1
      types = tally.map { case (id, m) =>
        FieldType(id, if (m.size > 1) MezaType.merge(m.keySet.toSet) else m.keys.head)
      }.toSeq
      conf = types.map(t => confidence(tally(t.id).getOrElse(t.mezaType, 0), hweight)).min
      // Reference compares Decimal(conf, 2dp) >= float(min_conf): the float's
      // exact binary value decides — float 0.9 sits above 0.90 (so 0.90 does
      // NOT converge), float 0.95 sits below 0.95 (so 0.95 does). Faithful
      // reproduction requires the same exact-value comparison.
      val confBD = BigDecimal(conf).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      if (confBD >= BigDecimal(new java.math.BigDecimal(minConf)) || count >= maxIter)
        converged = true
    }
    Result(types, conf, count, accurate = conf >= minConf)
  }

  /** process.type_cast (meza/process.py:39-115): one distributed projection
    * of lenient casts driven by the inferred (or user-supplied) types.
    */
  def typeCast(df: DataFrame, types: Seq[FieldType], warn: Boolean = false,
               dayFirst: Boolean = false): DataFrame = {
    val byId = types.map(t => t.id -> t.mezaType).toMap
    val cols: Seq[Column] = df.columns.toSeq.map { name =>
      val c = col(name)
      val casted = byId.get(name) match {
        case Some("null") => lit(null).cast(StringType)
        case Some("bool") => Lenient.toBool(c, warn)
        case Some("int") => Lenient.toInt(c, warn = warn)
        case Some("float") | Some("double") => Lenient.toFloat(c, warn = warn)
        case Some("decimal") => Lenient.toDecimal(c)
        case Some("date") =>
          if (df.schema(name).dataType == DateType) c
          else LenientDatetimeExpr.lenientDate(c.cast(StringType), dayFirst)
        case Some("time") => LenientDatetimeExpr.lenientTime(c.cast(StringType))
        case Some("datetime") =>
          if (df.schema(name).dataType == TimestampType) c
          else LenientDatetimeExpr.lenientTimestamp(c.cast(StringType), dayFirst)
        case Some("text") =>
          // process.py:104: None/blank -> "", else str(x)
          coalesce(when(trim(c.cast(StringType)) === "", lit("")).otherwise(c.cast(StringType)), lit(""))
        case _ => c // "iden": untyped fields pass through
      }
      casted.as(name)
    }
    df.select(cols: _*)
  }

  /** Convenience: detect + cast in one call (the canonical E1 pipeline). */
  def inferAndCast(df: DataFrame, minConf: Double = 0.95, hweight: Int = 6,
                   maxIter: Int = 100): (DataFrame, Result) = {
    val r = detect(df, minConf, hweight, maxIter)
    (typeCast(df, r.types), r)
  }
}
