package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Laws of the scaling-corpus generator (tools/ScaleGen, SCALING.md):
  * the sf1 measurements are only comparable to the driver SFs if the
  * generated corpus keeps the driver's shape and is exactly
  * reproducible. */
class ScaleGenSpec extends SparkSpec {

  private def gen(dir: String, docs: Int, vecs: Int): Unit =
    graft.tools.ScaleGen.generate(spark, sfDir, dir, docs, vecs, 42L)

  test("deterministic: two runs at the same seed produce identical tables") {
    import spark.implicits._
    val a = Files.createTempDirectory("graft_gen_a").toString
    val b = Files.createTempDirectory("graft_gen_b").toString
    gen(a, 1000, 200); gen(b, 1000, 200)
    val da = spark.read.parquet(s"$a/documents.parquet")
    val db = spark.read.parquet(s"$b/documents.parquet")
    assert(da.exceptAll(db).count() === 0 && db.exceptAll(da).count() === 0)
    val ea = spark.read.parquet(s"$a/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding".cast("array<double>"))
    val eb = spark.read.parquet(s"$b/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding".cast("array<double>"))
    assert(ea.exceptAll(eb).count() === 0 && eb.exceptAll(ea).count() === 0)
  }

  test("shape parity: schema matches the driver tables, dup rate ~1/20, langs ~driver mix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gen_c").toString
    gen(dir, 2000, 400)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ref = graft.ingest.Tables.documents(spark, sfDir)
    assert(docs.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      ref.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(docs.count() === 2000)
    // injected near-dups: every 20th doc carries the single-token marker
    val nDup = docs.filter($"text".contains("dup")).count()
    assert(nDup === 100, s"expected 2000/20 marker docs, got $nDup")
    // doc ids unique; n_chars consistent with text
    assert(docs.select($"doc_id").distinct().count() === 2000)
    assert(docs.filter(length($"text") =!= $"n_chars").count() === 0)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val refE = graft.ingest.Tables.embeddings(spark, sfDir)
    assert(emb.schema.fields.map(_.name).toSeq === refE.schema.fields.map(_.name).toSeq)
    assert(emb.select(size($"embedding")).distinct().head.getInt(0) === 64)
    assert(emb.select($"label").distinct().count() === 10)
  }

  test("zipf mode: head-heavy long-tail unigrams, same injection + determinism laws") {
    import spark.implicits._
    val a = Files.createTempDirectory("graft_gen_z1").toString
    val b = Files.createTempDirectory("graft_gen_z2").toString
    graft.tools.ScaleGen.generate(spark, sfDir, a, 2000, 200, 42L, "zipf")
    graft.tools.ScaleGen.generate(spark, sfDir, b, 2000, 200, 42L, "zipf")
    val da = spark.read.parquet(s"$a/documents.parquet")
    val db = spark.read.parquet(s"$b/documents.parquet")
    assert(da.exceptAll(db).count() === 0 && db.exceptAll(da).count() === 0)
    // injection law unchanged across modes: every 20th doc is a marker dup
    assert(da.filter($"text".contains("dup")).count() === 100)
    val terms = da.select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("cnt")).cache()
    val total = terms.agg(sum($"cnt")).head.getLong(0).toDouble
    // Zipf(s=1, V=12000): P(rank 1) = 1/H_V ≈ 0.102 — head token carries
    // ~10% of all mass (uniform mode: each token is 1/31 ≈ 3.2%)
    val headShare = terms.orderBy($"cnt".desc).head.getLong(1) / total
    assert(headShare > 0.08 && headShare < 0.13, s"head share $headShare not Zipf-like")
    // long tail: a large fraction of DISTINCT observed terms occur ≤ 2 times
    val nDistinct = terms.count().toDouble
    val nRare = terms.filter($"cnt" <= 2).count().toDouble
    assert(nDistinct > 2000, s"vocab too small to be long-tailed: $nDistinct")
    assert(nRare / nDistinct > 0.4, s"tail not sparse: ${nRare / nDistinct}")
    terms.unpersist()
  }
}
