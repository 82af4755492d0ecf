package graft

import graft.ext.TrainPrep
import org.apache.spark.sql.functions._

/** Invariants of the training-prep tier that the aggregate oracles
  * don't state directly. */
class TrainPrepSpec extends SparkSpec {

  test("q91: no source straddles the train/test boundary (leakage-free)") {
    val docs = graft.ingest.Tables.documents(spark, sfDir)
    val assigned = TrainPrep.assignSplit(docs)
    // every source maps to exactly one split
    val pairs = assigned.select("source", "split").distinct().count()
    val sources = docs.select(countDistinct("source")).head.getLong(0)
    assert(pairs === sources)
    // and both splits are non-empty at this SF (a degenerate all-train
    // split would silently void the guarantee's usefulness)
    assert(assigned.select("split").distinct().count() === 2)
  }

  test("q92: packing covers every token exactly once, shards contiguous per source") {
    val docs = graft.ingest.Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val packs = TrainPrep.tokenPacking(spark, sfDir)
    val packedTokens = packs.agg(sum("shard_tokens")).head.getLong(0)
    val corpusTokens = docs.agg(sum("n_tokens")).head.getLong(0)
    assert(packedTokens === corpusTokens, "every token lands in exactly one shard")
    val packedDocs = packs.agg(sum("n_docs")).head.getLong(0)
    assert(packedDocs === docs.count())
    // shard indexes are 0..k contiguous within each source
    val bad = packs.groupBy("source")
      .agg(min("shard_idx").as("lo"), max("shard_idx").as("hi"),
        countDistinct("shard_idx").as("n"))
      .filter(col("lo") =!= 0L || col("n") =!= col("hi") + 1)
    assert(bad.count() === 0)
  }
}
