package graft

import graft.sources.{GraftCatalog, JsonlStats}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed columns in the table format (r10): `array<float|double|long|
  * string|boolean>` and `boolean` round-trip through the JSONL
  * protocol — the embedding/data-model types the north star needs,
  * composing with the table tier (MoR deletes, time travel, lineage)
  * unchanged. */
class TypedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType), nullable = true),
    StructField("tags", ArrayType(StringType), nullable = true),
    StructField("flag", BooleanType, nullable = true)))

  test("arrays and booleans round-trip exactly, including nulls, null elements and empty arrays") {
    val dir = Files.createTempDirectory("typed").toString
    val rows = Seq(
      Row(1L, Array(1.5f, -2.25f, 3.4028235e38f, 1.4e-45f), Array("a", null, "c"), java.lang.Boolean.TRUE),
      Row(2L, Array.empty[Float], Array.empty[String], java.lang.Boolean.FALSE),
      Row(3L, null, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.format("graft-jsonl-stats").option("path", dir)
      .option("statsColumn", "id").mode("overwrite").save()
    val back = spark.read.format("graft-jsonl-stats").option("path", dir)
      .load().orderBy($"id").collect()
    assert(back.length === 3)
    // float extremes (max float, min subnormal) survive the text round-trip
    assert(back(0).getSeq[Float](1) === Seq(1.5f, -2.25f, 3.4028235e38f, 1.4e-45f))
    assert(back(0).getSeq[String](2) === Seq("a", null, "c"))
    assert(back(0).getBoolean(3) === true)
    assert(back(1).getSeq[Float](1).isEmpty && back(1).getSeq[String](2).isEmpty)
    assert(back(1).getBoolean(3) === false)
    assert(back(2).isNullAt(1) && back(2).isNullAt(2) && back(2).isNullAt(3))
  }

  test("typed columns compose with the table tier: MoR delete masks, time travel restores, lineage serves") {
    val dir = Files.createTempDirectory("typed_tier").toString
    val df = spark.range(20)
      .select($"id",
        transform(sequence(lit(0), lit(3)), j => ($"id" * 4 + j).cast("float")).as("vec"),
        ($"id" % 2 === 0).as("flag"))
    df.coalesce(1).sortWithinPartitions("id")
      .write.format("graft-jsonl-stats").option("path", dir)
      .option("statsColumn", "id").mode("overwrite").save()
    val m0 = JsonlStats.readTableMeta(dir)
    JsonlStats.writeTableMeta(dir, m0.copy(deleteMode = Some("merge-on-read")))
    val cat = "graft_typed_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    spark.sql(s"DELETE FROM $cat.`$t` WHERE flag = false")
    val kept = spark.sql(
      s"SELECT id, vec[0] AS v0, _row_id FROM $cat.`$t` ORDER BY id").collect()
    assert(kept.length === 10)
    kept.foreach { r =>
      assert(r.getLong(0) % 2 === 0L, "boolean filter must hold through the round-trip")
      assert(r.getFloat(1) === (r.getLong(0) * 4).toFloat)
      assert(r.getLong(2) === r.getLong(0), "MoR survivors keep lineage ids")
    }
    // time travel reads the pre-delete image, arrays intact
    val v1 = spark.sql(s"SELECT count(*) FROM $cat.`$t` VERSION AS OF 1").head().getLong(0)
    assert(v1 === 20L)
  }
}
