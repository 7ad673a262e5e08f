package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs; catalog `graft` registered
  * over a per-suite temp warehouse. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  protected val warehouse: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-wh-")

  protected lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // INT64 timestamps so parquet footers carry usable stats
    // (INT96, the default, has neither stats nor pushdown)
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.extensions", "graft.catalog.GraftExtensions")
    .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    .config("spark.sql.catalog.graft.warehouse", warehouse.toString)
    .getOrCreate()

  protected val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}
