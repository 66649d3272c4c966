package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns

class VectorExprSpec extends SparkSpec {

  test("native dot matches HOF formulation bitwise on the embeddings table") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    val diff = emb.select(
        VectorFns.dot(col("v"), col("v")).as("native"),
        VectorFns.dotHof(col("v"), col("v")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("native cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFns.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0 && got(2) == 0.0)
  }

  test("mixed float/double children are accepted") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("f", "d")
    val v = df.select(VectorFns.dot(col("f"), col("d"))).collect().head.getDouble(0)
    assert(v == 11.0)
  }
}
