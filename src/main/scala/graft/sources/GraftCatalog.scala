package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** `GraftCatalog`: a DataSource V2 **catalog plugin** — the engine
  * extending Spark's catalog layer itself (`TableCatalog` +
  * `FunctionCatalog`), not just its scan API. Registered per session via
  * `spark.sql.catalog.<name> = graft.sources.GraftCatalog` with a
  * `<name>.root` option pointing at a directory of manifest-listed
  * JSONL tables (one subdirectory per table, each a [[JsonlStats]]
  * layout). SQL then addresses tables as `<name>.<table>` with no
  * `createOrReplaceTempView` plumbing, and every connector capability —
  * column/filter/aggregate pushdown, runtime filtering, metadata
  * columns, key-grouped layouts — rides through catalog resolution
  * unchanged (the identifier path and the `format(...)` path meet at
  * the same [[JsonlStatsTable]]).
  *
  * The catalog is deliberately READ-ONLY: `createTable`/`dropTable`
  * raise. Write-side table management belongs to the ingest layer's
  * commit protocol (q160); a catalog that silently created empty
  * manifests would hand out tables whose readers see nothing.
  *
  * The function side exposes `sqnorm` (exact squared L2 norm of a float
  * embedding) as a V2 [[ScalarFunction]]: per-element products in
  * double, each rounded to DECIMAL(38,25), summed exactly — the same
  * determinism contract as `ext.SimilarityMath.dotDec`, so the result
  * is bit-identical to the DuckDB oracle's decimal sum regardless of
  * element order or engine. The class also declares the magic `invoke`
  * method, which Spark binds via codegen (an `Invoke` expression, no
  * row boxing) instead of the reflective `produceResult` path.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = options.get("root")
    require(root != null, s"catalog $name needs a 'root' option")
  }
  override def name(): String = catName

  private def dirOf(ident: Identifier) =
    java.nio.file.Paths.get(root, (ident.namespace() :+ ident.name()): _*)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = java.nio.file.Paths.get(root, namespace: _*)
    if (!java.nio.file.Files.isDirectory(base)) throw new NoSuchNamespaceException(namespace)
    val s = java.nio.file.Files.list(base)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.exists(p.resolve("_stats.jsonl")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!java.nio.file.Files.exists(dir.resolve("_stats.jsonl")))
      throw new NoSuchTableException(ident)
    // table-level metadata is authoritative: a user-id-bounded table
    // resolved with the default stats column would prune files against
    // the wrong bounds and answer MIN/MAX pushdown from them — wrong
    // results with no error (r6 review)
    val meta = JsonlStats.readTableMeta(dir.toString)
    new JsonlStatsTable(dir.toString,
      meta.schema.getOrElse(JsonlStats.schema),
      meta.statsCol.getOrElse(JsonlStats.statsColumn),
      meta.partitionCol)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"$catName is read-only: tables are published by the ingest commit protocol")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"$catName is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(s"$catName is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(s"$catName is read-only")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(namespace, "sqnorm"))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "sqnorm") GraftCatalog.SqNorm
    else throw new NoSuchFunctionException(ident)
}

object GraftCatalog {

  /** Exact squared-norm accumulation shared by both invocation paths:
    * double products rounded to DECIMAL(38,25) each, summed exactly
    * (order-free), then QUANTIZED to 9 dp before the double conversion —
    * a >17-sig-digit decimal's nearest double can differ by one ulp
    * between engines, so the result is first rounded to a ≤13-sig-digit
    * grid every double represents exactly (the q117/q137 discipline). */
  private def sqNormExact(a: ArrayData): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble
      // valueOf (toString-canonical), NOT new BigDecimal (exact binary
      // expansion): Spark's double->decimal cast is canonical-based, and
      // the 25th decimal of the binary expansion can differ from it
      acc = acc.add(java.math.BigDecimal.valueOf(x * x)
        .setScale(25, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  object SqNorm extends UnboundFunction {
    override def name(): String = "sqnorm"
    override def description(): String =
      "sqnorm(array<float>) -> double: exact decimal-summed squared L2 norm"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == ArrayType(FloatType),
        s"sqnorm expects (array<float>), got $inputType")
      SqNormBound
    }
  }

  object SqNormBound extends ScalarFunction[Double] {
    override def inputTypes(): Array[DataType] = Array(ArrayType(FloatType))
    override def resultType(): DataType = DoubleType
    override def name(): String = "sqnorm"
    override def canonicalName(): String = "graft.sqnorm"
    override def isResultNullable: Boolean = false
    /** Magic method — bound by codegen as an Invoke, no row boxing. */
    def invoke(a: ArrayData): Double = sqNormExact(a)
    /** Reflective fallback path. */
    override def produceResult(input: InternalRow): Double =
      sqNormExact(input.getArray(0))
  }
}
