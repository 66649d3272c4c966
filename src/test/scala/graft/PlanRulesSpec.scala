package graft

import org.apache.spark.sql.functions._

import graft.plans.LevenshteinBound

class PlanRulesSpec extends SparkSpec {

  test("LevenshteinBound: length-gap conjunct injected once, results unchanged") {
    val names = Tables.part(spark, sfDir).select(col("p_name")).distinct()
    def fuzzy = names.select(col("p_name").as("a"))
      .join(names.select(col("p_name").as("b")),
        levenshtein(col("a"), col("b")) <= 2 && col("a") < col("b"))
    val base = fuzzy.collect().map(_.toString).sorted.toSeq
    assert(base.nonEmpty)
    assert(!fuzzy.queryExecution.optimizedPlan.toString.contains("abs("))
    spark.experimental.extraOptimizations = Seq(LevenshteinBound)
    try {
      val plan = fuzzy.queryExecution.optimizedPlan.toString
      // the implied bound is present — and exactly once, proving the
      // rule is idempotent under the fixpoint batch
      assert("abs\\(\\(length\\(".r.findAllIn(plan).length == 1, plan)
      assert(fuzzy.collect().map(_.toString).sorted.toSeq == base,
        "LevenshteinBound changed query results")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("LevenshteinBound: filters strengthened too, strict form covered") {
    // def, not val: a DataFrame caches its QueryExecution, so a plan
    // built before the rule install would never see the rule
    def df = Tables.part(spark, sfDir)
      .filter(levenshtein(col("p_name"), lit("red widget")) < 3)
    val base = df.collect().map(_.toString).sorted.toSeq
    spark.experimental.extraOptimizations = Seq(LevenshteinBound)
    try {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("abs("), plan)
      assert(df.collect().map(_.toString).sorted.toSeq == base)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
