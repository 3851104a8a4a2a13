package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion and output: schema-checked readers, partitioned writers.
  *
  * Scale posture: readers force an explicit schema (inference is a full
  * extra pass over 100 TB); writers partition by low-cardinality keys so
  * downstream scans prune, and sort within partitions so parquet
  * min/max row-group stats actually cut I/O.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema — never schema-inference at scale. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** JSON-lines with an explicit schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned, stats-friendly parquet write: partition columns prune
    * whole directories; sortWithinPartitions orders row groups so
    * min/max statistics make selective scans skip pages. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.sortWithinPartitions((partitionCols ++ sortCols).map(df.col): _*)
      else df
    sorted.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Plain single-dataset write (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
