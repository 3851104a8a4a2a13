package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: SURVEY.md §2 is the graded inventory and
  * must stay in lockstep with SparkEntry — every §2 row is a real query
  * key, every `full` row has an oracle, every `rows` row is a documented
  * rows-only check, and nothing exists in code that §2 does not list. */
class ContractSpec extends AnyFunSuite with SharedSpark {

  private val row = """\|\s*\d+\s*\|\s*`([a-z0-9_]+)`\s*\|[^|]*\|\s*(full|rows)\s*\|""".r

  private lazy val surveyRows: Map[String, String] =
    scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines()
      .flatMap(l => row.findFirstMatchIn(l).map(m => m.group(1) -> m.group(2)))
      .toMap

  test("SURVEY §2 keys exactly match SparkEntry.queries") {
    assert(surveyRows.keySet === SparkEntry.queries.keySet,
      s"only in SURVEY: ${surveyRows.keySet -- SparkEntry.queries.keySet}; " +
      s"only in code: ${SparkEntry.queries.keySet -- surveyRows.keySet}")
  }

  test("every full-oracle row has oracle SQL; every rows-only row has none") {
    val withOracle = SparkEntry.oracleSql.keySet
    surveyRows.foreach {
      case (k, "full") => assert(withOracle.contains(k), s"$k claims full oracle, none defined")
      case (k, "rows") => assert(!withOracle.contains(k), s"$k claims rows-only but has an oracle")
      case _ => ()
    }
  }

  test("every oracle key is a real query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("wrong-arity graft function calls raise an analysis error") {
    // FnArity guards both registry surfaces; without it a bad SQL call
    // dies with IndexOutOfBoundsException from args(1)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("graft_dot") && e.getMessage.contains("2"),
      s"unexpected message: ${e.getMessage}")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bpe_segment('ab')").collect()
    }
    assert(e2.getMessage.contains("graft_bpe_segment"))
  }

  test("rows-only set is exactly the documented engine-specific operators") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set(
      "q13_approx_distinct",
      "q38_percentiles_approx",
      "c16_sketch_rollup", "c17_freq_rollup", "c18_bloom_gate",
      "c19_quantile_rollup", "st10_sketch_stream"))
  }
}
