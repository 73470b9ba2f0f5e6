package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S10 read_dbf (meza/io.py:677-722, meza/dbf.py): dBase/FoxPro tables.
  * The format is a fixed-width binary: 32-byte header (record count at
  * offset 4, header/record sizes at 8/10), 32-byte field descriptors until
  * 0x0D, then fixed-width ASCII records with a leading deletion flag.
  *
  * Driver-side eager parse — the reference's read_dbf materializes too
  * (README.rst:579); .dbf files are small legacy interchange files, never
  * data-plane inputs. Values come back as trimmed strings (D fields ISO-
  * formatted, L fields True/False) for DetectTypes.typeCast to type, the
  * same split the reference uses.
  */
object DbfReader {

  def read(spark: SparkSession, path: String, lowerNames: Boolean = true,
           charset: String = "ISO-8859-1"): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xFFFF
    val recordSize = bb.getShort(10) & 0xFFFF

    final case class Field(name: String, ftype: Char, len: Int)
    val fields = Iterator.from(32, 32)
      .takeWhile(i => i < headerSize && bytes(i) != 0x0D)
      .map { i =>
        val raw = bytes.slice(i, i + 32)
        val name0 = new String(raw.takeWhile(_ != 0), "ASCII")
        Field(if (lowerNames) name0.toLowerCase else name0, raw(11).toChar, raw(16) & 0xFF)
      }.toVector

    def decode(f: Field, raw: String): String = {
      val v = raw.trim
      f.ftype match {
        case 'D' if v.length == 8 => s"${v.substring(0, 4)}-${v.substring(4, 6)}-${v.substring(6, 8)}"
        case 'L' => v.toUpperCase match {
          case "T" | "Y" => "True"
          case "F" | "N" => "False"
          case _ => null
        }
        case _ => v
      }
    }

    val rows = (0 until nRec).flatMap { r =>
      val off = headerSize + r.toLong * recordSize
      if (off + recordSize > bytes.length) None
      else if (bytes(off.toInt) == '*') None // deleted record
      else {
        var pos = off.toInt + 1
        Some(Row.fromSeq(fields.map { f =>
          val raw = new String(bytes.slice(pos, pos + f.len), charset)
          pos += f.len
          decode(f, raw)
        }))
      }
    }
    val schema = StructType(fields.map(f => StructField(f.name, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 1), schema)
  }
}
