package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture aid for the optimization rounds: builds the named
  * SparkEntry queries against a scale-factor dir and writes each one's
  * `.explain("formatted")` output to `<outDir>/<key>_<tag>.txt` — the
  * committed evidence (plans/r18/...) the optimization log cites.
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <tag> <k1,k2,...>
  * Note a query gate RUNS when built (tx gates commit their tables
  * first and return the final read): the dump therefore reflects the
  * exact frame the bench's noop sink executes. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, keys) = args.take(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.split(",").map(_.trim).filter(_.nonEmpty).foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${k}_$tag.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[explain] $k -> $outDir/${k}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $k failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
