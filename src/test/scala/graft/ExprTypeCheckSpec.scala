package graft

import org.apache.spark.sql.functions._

import graft.functions.{NativeChunk, NativeHash, VectorFns}

/** Negative paths: the native expressions must reject wrong input
  * types at analysis time, not crash at runtime. */
class ExprTypeCheckSpec extends SparkSpec {

  import spark.implicits._

  test("graft_dot rejects non-array children") {
    val df = Seq((1, "x")).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFns.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("graft_jaccard rejects non-long arrays") {
    val df = Seq((Array("a"), Array("b"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(NativeHash.jaccard(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_jaccard"))
  }

  test("graft_chunk rejects numeric input") {
    val df = Seq(1).toDF("n")
    val e = intercept[Exception] {
      df.select(NativeChunk.chunks(col("n"))).collect()
    }
    assert(e.getMessage.contains("graft_chunk"))
  }

  test("graft_chunk handles null and empty input") {
    val df = Seq(Some(""), None).toDF("text")
    assert(df.select(NativeChunk.chunks(col("text"))).count() == 0)
  }
}
