package graft.ingest

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** ORC as a second columnar interchange format (SURVEY §2.1 breadth
  * beyond the reference's JSON/CSV/parquet): some warehouse estates are
  * ORC-native (Hive lineage), and an engine claiming the reference's
  * sink surface should land both columnar formats through the same
  * writer contract — partitioned layout, overwrite semantics, schema
  * fidelity on read-back.
  *
  * q103 is a round-trip proof in the q97 mold: land the documents table
  * as lang-partitioned ORC, read it back, aggregate. DuckDB cannot read
  * ORC, so the oracle computes the identical aggregate over the source
  * parquet — any row, column, or value the ORC round-trip loses or
  * mangles (including the lang partition column, which ORC stores in
  * the directory layout, not the file) breaks the hash.
  */
object ColumnarFormats extends QueryModule {

  /** q103: parquet → lang-partitioned ORC → read-back aggregate. */
  def orcRoundtrip(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dir = Landing.fixtureDir(d, "documents_orc")
    val marker = Paths.get(dir + "__orc_ok")
    if (!Files.exists(marker)) {
      graft.util.Fs.deleteRecursively(dir)
      Tables.documents(spark, d)
        .repartition(col("lang")) // one writer task per partition value
        .write.partitionBy("lang").orc(dir)
      Files.write(marker, Array.emptyByteArray)
    }
    spark.read.orc(dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"source")
  }

  /** q127: SCHEMA EVOLUTION across file generations — the drift every
    * long-lived table accumulates: files written before a column
    * existed sit next to files written after. The fixture lands two
    * generations (gen=1: pre-1998 orders WITHOUT o_orderpriority;
    * gen=2: 1998+ orders with it); `mergeSchema` unions the file
    * schemas at read time and back-fills the missing column with
    * nulls, so ONE reader serves the whole history — no rewrite of
    * petabytes of old files to add a column. The oracle reconstructs
    * the same view from the raw table (priority known only where the
    * writing generation carried it), pinning the null semantics, not
    * just the row count. */
  def schemaEvolution(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val cutoff = "1998-01-01"
    val dir = Landing.ensureBuilt(Landing.fixtureDir(d, "orders_evolving")) { dd =>
      val o = Tables.orders(spark, d)
      o.filter($"o_orderdate" < cutoff)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
        .write.parquet(dd + "/gen=1")
      o.filter($"o_orderdate" >= cutoff)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate",
          $"o_orderpriority")
        .write.parquet(dd + "/gen=2")
    }
    spark.read.option("mergeSchema", "true").parquet(dir)
      .groupBy(coalesce($"o_orderpriority", lit("(pre-schema)")).as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        graft.util.Det.msum($"o_totalprice").as("revenue"))
      .orderBy($"priority")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q103_orc_roundtrip" -> orcRoundtrip,
    "q127_schema_evolution" -> schemaEvolution,
  )

  val oracles = Map(
    "q127_schema_evolution" ->
      """SELECT CASE WHEN CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1998-01-01'
        |            THEN o_orderpriority ELSE '(pre-schema)' END AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY priority
        |ORDER BY priority""".stripMargin,
    "q103_orc_roundtrip" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
  )
}
