package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native dot-product expression must agree exactly with the
  * higher-order-function formulation (same double op order), in both
  * codegen and interpreted evaluation. */
class FunctionsSpec extends SparkSpec {

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(64, Gen.chooseNum(-1000, 1000).map(_ / 997.0f))

  test("graft_dot == aggregate(zip_with(...)) on random float vectors") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = (1L to 20L).map { s =>
      val a = vecGen(Gen.Parameters.default, Seed(s)).getOrElse(Nil)
      val b = vecGen(Gen.Parameters.default, Seed(s + 100)).getOrElse(Nil)
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", call_function("graft_dot", $"a", $"b"))
      .withColumn("hof",
        aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v))
    assert(df.filter($"native" =!= $"hof").isEmpty)
  }

  test("graft_dot usable from SQL and survives null inputs") {
    GraftFunctions.register(spark)
    val one = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").first().getDouble(0)
    assert(one === 4.0)
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .first()
    assert(n.isNullAt(0))
  }
}
