package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Byte-compatibility law of the r16 streaming-generator encoder
  * (JsonlFileSink.genJson) against the formulation it replaced: an
  * explicit JsonNode tree built with JsonNodeFactory and serialized via
  * node.toString — replicated HERE, type case by type case, from the
  * pre-r16 jsonOf. If the generator ever diverges (number shortest-form,
  * string escaping, NaN quoting, field order), existing tables' bytes
  * and their recorded stats/zone offsets stop matching fresh writes and
  * the blind-range byte arithmetic (bpos ownership) silently shifts —
  * so this is pinned at the byte level, not via a JSON-equality check. */
class FormatBytesSpec extends SparkSpec {

  private val jnf = JsonNodeFactory.instance

  // ---- the OLD tree formulation, verbatim over plain JVM values ----
  private def tree(v: Any): com.fasterxml.jackson.databind.JsonNode = v match {
    case null                      => jnf.nullNode()
    case x: Long                   => jnf.numberNode(x)
    case x: Int                    => jnf.numberNode(x)    // DateType days
    case x: Double                 => jnf.numberNode(x)
    case x: Float                  => jnf.numberNode(x)
    case x: String                 => jnf.textNode(x)
    case x: Boolean                => jnf.booleanNode(x)
    case x: java.math.BigDecimal   => jnf.textNode(x.toPlainString)
    case xs: Seq[_] =>
      val a = jnf.arrayNode(xs.length)
      xs.foreach(e => a.add(tree(e)))
      a
    case kvs: Map[_, _] =>
      val o = jnf.objectNode()
      kvs.foreach { case (k, e) =>
        o.set[com.fasterxml.jackson.databind.JsonNode](k.toString, tree(e))
      }
      o
  }
  private def obj(fields: (String, Any)*): com.fasterxml.jackson.databind.JsonNode = {
    val o = jnf.objectNode()
    fields.foreach { case (k, v) =>
      o.set[com.fasterxml.jackson.databind.JsonNode](k, tree(v))
    }
    o
  }
  private def expectedLine(fields: (String, Any)*): String = {
    val node = new ObjectMapper().createObjectNode()
    fields.foreach { case (k, v) =>
      node.set[com.fasterxml.jackson.databind.JsonNode](k, v match {
        case s: Seq[(String, Any)] @unchecked
          if s.nonEmpty && s.head.isInstanceOf[(_, _)] => obj(s: _*)
        case other => tree(other)
      })
    }
    node.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("ts", TimestampType),
    StructField("dt", DateType),
    StructField("dec", DecimalType(38, 10)),
    StructField("arr", ArrayType(LongType)),
    StructField("st", StructType(Seq(
      StructField("a", LongType), StructField("bb", StringType)))),
    StructField("m", MapType(StringType, DoubleType))))

  private def writeRows(rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("fmt_bytes").toString
    spark.createDataFrame(rows.asJava, schema).coalesce(1)
      .write.format("graft-jsonl-stats").option("path", dir)
      .mode("overwrite").save()
    dir
  }

  private def dataLines(dir: String): Seq[String] = {
    val data = Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".jsonl") &&
        !p.getFileName.toString.startsWith("_"))
      .toSeq
    assert(data.size === 1, s"expected one data file, got $data")
    Files.readAllLines(data.head, UTF_8).asScala.toSeq
  }

  test("generator bytes ≡ JsonNode-tree bytes across the full type surface") {
    val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T12:34:56.123456Z"))
    val dt1 = java.sql.Date.valueOf("2024-03-01")
    val dec1 = new java.math.BigDecimal("12345.6789")
    val dec2 = new java.math.BigDecimal("-0.0000000001")
    val rows = Seq(
      Row(1L, 0.1, 1.1f, "plain", true, ts1, dt1, dec1,
        Seq(1L, null, 3L), Row(7L, "x"), Map("k1" -> 2.5, "k\"2" -> null)),
      Row(Long.MaxValue, 1.0e-5, Float.MinPositiveValue,
        "esc \" \\ \n \t  héllo 🚀", false,
        java.sql.Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.999999Z")),
        java.sql.Date.valueOf("1969-01-01"), dec2,
        Seq.empty[Long], Row(null, "y"), Map.empty[String, Double]),
      Row(Long.MinValue, -0.0, -3.4e38f, "", true, null, null, null,
        null, null, null),
      Row(4L, Double.NaN, Float.NegativeInfinity, "inf row", false, ts1, dt1,
        new java.math.BigDecimal("9e27"), Seq(-1L), Row(0L, ""), Map("a" -> Double.PositiveInfinity)))
    val dir = writeRows(rows)
    val lines = dataLines(dir)
    assert(lines.size === 4)

    // internal representations, converted exactly as the writer reads them
    def micros(t: java.sql.Timestamp): Long =
      java.time.temporal.ChronoUnit.MICROS.between(java.time.Instant.EPOCH, t.toInstant)
    def days(d: java.sql.Date): Int = d.toLocalDate.toEpochDay.toInt
    def dec(b: java.math.BigDecimal): java.math.BigDecimal = b.setScale(10)

    val expected = Seq(
      expectedLine("id" -> 1L, "d" -> 0.1, "f" -> 1.1f, "s" -> "plain",
        "b" -> true, "ts" -> micros(ts1), "dt" -> days(dt1), "dec" -> dec(dec1),
        "arr" -> Seq(1L, null, 3L), "st" -> Seq("a" -> 7L, "bb" -> "x"),
        "m" -> scala.collection.immutable.ListMap("k1" -> 2.5, "k\"2" -> null)),
      expectedLine("id" -> Long.MaxValue, "d" -> 1.0e-5, "f" -> Float.MinPositiveValue,
        "s" -> "esc \" \\ \n \t  héllo 🚀", "b" -> false,
        "ts" -> -1L, "dt" -> days(java.sql.Date.valueOf("1969-01-01")),
        "dec" -> dec(dec2), "arr" -> Seq.empty[Long],
        "st" -> Seq("a" -> null, "bb" -> "y"), "m" -> Map.empty[String, Double]),
      expectedLine("id" -> Long.MinValue, "d" -> -0.0, "f" -> -3.4e38f,
        "s" -> "", "b" -> true, "ts" -> null, "dt" -> null, "dec" -> null,
        "arr" -> null, "st" -> null, "m" -> null),
      expectedLine("id" -> 4L, "d" -> Double.NaN, "f" -> Float.NegativeInfinity,
        "s" -> "inf row", "b" -> false, "ts" -> micros(ts1), "dt" -> days(dt1),
        "dec" -> dec(new java.math.BigDecimal("9e27")), "arr" -> Seq(-1L),
        "st" -> Seq("a" -> 0L, "bb" -> ""),
        "m" -> Map("a" -> Double.PositiveInfinity)))

    lines.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got === want, s"row $i bytes diverge")
      assert(java.util.Arrays.equals(got.getBytes(UTF_8), want.getBytes(UTF_8)),
        s"row $i UTF-8 bytes diverge")
    }
  }

  test("scan round-trips the generator's bytes (all types, nulls, specials)") {
    val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T12:34:56.123456Z"))
    val dt1 = java.sql.Date.valueOf("2024-03-01")
    val rows = Seq(
      Row(1L, 0.1, 1.1f, "plain", true, ts1, dt1,
        new java.math.BigDecimal("12345.6789000000"),
        Seq(1L, null, 3L), Row(7L, "x"), Map("k1" -> 2.5)),
      Row(2L, -0.0, 0.0f, "", false, null, null, null, null, null, null))
    val dir = writeRows(rows)
    // set ops reject MAP columns — compare on sorted entry arrays
    def cmp(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("m", org.apache.spark.sql.functions.expr(
        "array_sort(map_entries(m))"))
    val back = cmp(spark.read.format("graft-jsonl-stats").option("path", dir)
      .schema(schema).load())
    val orig = cmp(spark.createDataFrame(rows.asJava, schema))
    assert(back.count() === 2)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("block-spanning lines: rows larger than the 64 KiB read buffer round-trip") {
    // lengths straddle the block boundary from both sides, plus one line
    // spanning four blocks; shifting offsets exercise every straddle
    val block = 1 << 16
    val lens = Seq(block - 40, block - 1, block, block + 1, block + 37, 4 * block + 123)
    val rows = lens.zipWithIndex.map { case (n, i) =>
      val ch = ('a' + (i % 26)).toChar
      Row(i.toLong, i.toDouble, i.toFloat, ch.toString * n, true, null, null,
        null, null, null, null)
    }
    val dir = writeRows(rows)
    val back = spark.read.format("graft-jsonl-stats").option("path", dir)
      .schema(schema).load()
      .selectExpr("id", "length(s) AS n", "substring(s, 1, 1) AS h")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(back.length === lens.size)
    lens.zipWithIndex.foreach { case (n, i) =>
      val ch = ('a' + (i % 26)).toChar.toString
      assert(back(i) === ((i.toLong, n, ch)), s"row $i (len $n) mangled")
    }
  }
}
