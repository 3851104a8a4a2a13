package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.{BeforeAndAfterAll, Suite}

/** One session for the whole test run (Spark startup dominates). */
object SharedSpark {
  lazy val spark: SparkSession = Tables.tune(
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate())

  val sfDir = "/root/testdata/sf0.001"

  def table(name: String): DataFrame = Tables.load(spark, sfDir, name)
}

trait SharedSpark extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SharedSpark.spark
  def table(name: String): DataFrame = SharedSpark.table(name)
}
