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

  test("q138: chunking covers every token position, starts step by the stride") {
    import spark.implicits._
    val stride = 48L
    val chunks = TrainPrep.docChunking(spark, sfDir)
    val docs = graft.ingest.Tables.documents(spark, sfDir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val per = chunks.groupBy($"doc_id").agg(
      min($"chunk_idx").as("k0"),
      max($"chunk_idx").as("kmax"),
      count(lit(1)).as("n_chunks"),
      max($"chunk_idx" * stride + $"n_tokens_chunk").as("right_edge"))
      .join(docs, "doc_id")
    // chunk indices are 0..kmax contiguous (count == kmax+1); with
    // stride < chunk length that means zero gaps between chunks
    val bad = per.filter(
      $"k0" =!= 0L || $"n_chunks" =!= $"kmax" + 1 ||
        // the final chunk's right edge reaches the last token exactly
        $"right_edge" =!= $"n" ||
        // chunk count matches the closed-form ⌊(n−1)/stride⌋+1
        $"kmax" =!= expr(s"(n - 1) div $stride"))
    assert(bad.isEmpty, "chunk coverage law violated")
  }

  test("q153: CDC chunk boundaries are edit-local; fixed stride shifts everything") {
    import spark.implicits._
    // a long deterministic pseudo-text (varied tokens so boundaries occur)
    val words = (1 to 400).map(i => f"w${(i * 2654435761L) % 997}%03d")
    val orig = words.mkString(" ")
    val edited = "INSERTED " + orig // one-token prepend at the start
    val docs = Seq((1L, orig), (2L, edited)).toDF("doc_id", "text")
    val chunks = TrainPrep.cdcChunks(docs)
    val origMd5 = chunks.filter($"doc_id" === 1L).select("chunk_md5")
      .collect().map(_.getString(0)).toSeq
    val editMd5 = chunks.filter($"doc_id" === 2L).select("chunk_md5")
      .collect().map(_.getString(0)).toSeq
    assert(origMd5.size > 5, "fixture must produce several chunks")
    // every original chunk except the first is reproduced verbatim in the
    // edited doc: the boundary predicate sees only adjacent token pairs,
    // and a prepend leaves every original pair intact
    val shared = origMd5.toSet.intersect(editMd5.toSet)
    assert(origMd5.tail.forall(shared.contains),
      "all chunks after the first must survive a prepend edit")
    // contrast: fixed-stride chunking of the same pair shares (almost)
    // nothing — every chunk's content shifts by one token
    val origStride = docChunkMd5s(docs.filter($"doc_id" === 1L))
    val editStride = docChunkMd5s(docs.filter($"doc_id" === 2L))
    val strideShared = origStride.toSet.intersect(editStride.toSet)
    assert(strideShared.size <= 1,
      s"fixed stride should share ~no chunks after a prepend, shared $strideShared")
    // coverage law holds for CDC too: chunk lengths sum to doc length
    val cov = chunks.groupBy($"doc_id")
      .agg(sum($"n_tokens_chunk").as("covered"))
      .join(docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n")), "doc_id")
      .filter($"covered" =!= $"n")
    assert(cov.count() === 0)
  }

  /** q138's chunk hashing applied to an arbitrary (doc_id, text) frame —
    * the stride contrast leg of the q153 edit-locality law. */
  private def docChunkMd5s(docs: org.apache.spark.sql.DataFrame): Seq[String] = {
    import spark.implicits._
    val stride = 48
    docs.select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("n", size($"toks"))
      .withColumn("k", explode(sequence(lit(0L), expr(s"(n - 1) div $stride"))))
      .withColumn("chunk", slice($"toks", ($"k" * stride + 1).cast("int"), lit(64)))
      .select(md5(concat_ws(" ", $"chunk")))
      .collect().map(_.getString(0)).toSeq
  }

  test("q156: curriculum positions are dense per shard and phase-monotone") {
    import spark.implicits._
    val sh = TrainPrep.curriculumShards(spark, sfDir)
    // every document is placed exactly once
    val docs = graft.ingest.Tables.documents(spark, sfDir)
    assert(sh.count() === docs.count())
    assert(sh.select("doc_id").distinct().count() === docs.count())
    // positions are 1..n dense within each shard
    val dense = sh.groupBy($"shard")
      .agg(min($"pos").as("lo"), max($"pos").as("hi"), count(lit(1)).as("n"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n")
    assert(dense.count() === 0)
    // phase never decreases as pos increases (coarse-to-hard order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"pos")
    val regress = sh.withColumn("prev", lag($"phase", 1).over(w))
      .filter($"prev".isNotNull && $"phase" < $"prev")
    assert(regress.count() === 0, "a later position must never be an earlier phase")
    // the order is a deterministic function of content (re-run ≡ run):
    // shard, phase and scramble all derive from doc_id/text, never from
    // input layout or task scheduling
    val again = TrainPrep.curriculumShards(spark, sfDir)
    assert(sh.exceptAll(again).isEmpty && again.exceptAll(sh).isEmpty)
  }
}
