package graft

import graft.ext.Mixing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws of the corpus-mixing tier. */
class MixingSpec extends SparkSpec {

  test("two-pass global enumeration ≡ single-window global row_number") {
    import spark.implicits._
    val docs = graft.ingest.Tables.documents(spark, sfDir)
      .withColumn("k", ($"doc_id" * 37 % 101).cast("double"))
    val twoPass = Mixing.withGlobalPosition(
      docs, Seq($"k", $"doc_id"), nPart = 5, outCol = "gpos")
      .select($"doc_id", $"gpos")
    val oneWindow = docs.withColumn("gpos",
        row_number().over(Window.orderBy($"k", $"doc_id")).cast("long"))
      .select($"doc_id", $"gpos")
    assert(twoPass.except(oneWindow).count() === 0)
    assert(oneWindow.except(twoPass).count() === 0)
  }

  test("q104: shards partition the corpus exactly, en is front-loaded 3:1") {
    import spark.implicits._
    val shards = Mixing.corpusMixing(spark, sfDir).collect()
    val total = shards.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.ingest.Tables.documents(spark, sfDir).count())
    // positions are contiguous across shards
    val sorted = shards.sortBy(_.getAs[Long]("shard"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("first_pos") === a.getAs[Long]("last_pos") + 1)
      case _ =>
    }
    // the weight-3 source is consumed faster: en share in the first shard
    // is >= its share in the last one
    val enShare = (r: org.apache.spark.sql.Row) =>
      r.getAs[Long]("n_en").toDouble / r.getAs[Long]("n_docs")
    assert(enShare(sorted.head) >= enShare(sorted.last))
  }
}
