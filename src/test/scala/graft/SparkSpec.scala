package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per suite (cheap —
  * getOrCreate reuses the JVM-wide session), UTC, nanos-as-long for the
  * driver's TIMESTAMP(NANOS) events table, small shuffle fan-out. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .getOrCreate()

  /** Smallest driver-generated SF — fast enough for unit tests. */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session for sibling suites (same JVM); do not stop
    super.afterAll()
  }
}
