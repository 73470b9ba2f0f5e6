package graft.types

import org.apache.spark.sql.types._

/** The reference's 10 logical types (meza/process.py:97-108 cast switch;
  * dialect tables fntools.py:50-110) and their Spark + DDL mappings
  * (SURVEY.md §1.2).
  */
sealed abstract class MezaType(
    val name: String,
    val spark: DataType,
    val postgres: String,
    val mysql: String,
    val sqlite: String)

object MezaType {
  case object MNull extends MezaType("null", NullType, "boolean", "CHAR(0)", "INT")
  case object MBool extends MezaType("bool", BooleanType, "boolean", "BOOL", "INT")
  case object MInt extends MezaType("int", LongType, "integer", "INT", "INT")
  case object MFloat extends MezaType("float", DoubleType, "real", "FLOAT", "REAL")
  case object MDouble extends MezaType("double", DoubleType, "double precision", "DOUBLE", "REAL")
  case object MDecimal extends MezaType("decimal", DecimalType(38, 2), "decimal", "DECIMAL", "REAL")
  case object MDate extends MezaType("date", DateType, "date", "DATE", "TEXT")
  // Spark has no time-of-day type: canonical "HH:mm:ss" strings (SURVEY §1.2)
  case object MTime extends MezaType("time", StringType, "time", "TIME", "TEXT")
  case object MDatetime extends MezaType("datetime", TimestampType, "timestamp", "DATETIME", "TEXT")
  case object MText extends MezaType("text", StringType, "text", "TEXT", "TEXT")

  val all: Seq[MezaType] = Seq(MNull, MBool, MInt, MFloat, MDouble, MDecimal,
    MDate, MTime, MDatetime, MText)
  val byName: Map[String, MezaType] = all.map(t => t.name -> t).toMap

  /** Compatible-type merge lattice (process.py:237-256 gen_types):
    * {float,int}->float, {date,time,datetime}->datetime, {bool,int}->int,
    * anything else -> text; nulls are ignored unless alone. */
  private val compat: Seq[(Set[String], String)] = Seq(
    (Set("float", "int"), "float"),
    (Set("date", "time", "datetime"), "datetime"),
    (Set("bool", "int"), "int"))

  /** DDL generation (reference K6: fntools dialect tables + get_dtype
    * fntools.py:312-322): CREATE TABLE statement for a typed field list. */
  def createTableSql(table: String, fields: Seq[(String, String)],
                     dialect: String = "postgres"): String = {
    val colType: MezaType => String = dialect match {
      case "postgres" => _.postgres
      case "mysql" => _.mysql
      case "sqlite" => _.sqlite
      case other => throw new IllegalArgumentException(s"unknown dialect $other")
    }
    val cols = fields.map { case (name, t) =>
      s"$name ${colType(byName.getOrElse(t, MText))}" }
    s"CREATE TABLE $table (${cols.mkString(", ")})"
  }

  def merge(types: Set[String]): String = {
    val nonNull = types - "null"
    if (nonNull.isEmpty) "null"
    else if (nonNull.size == 1) nonNull.head
    else compat.collectFirst { case (k, v) if nonNull.subsetOf(k) => v }.getOrElse("text")
  }
}
