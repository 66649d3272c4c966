package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema-drift smoke test. The driver regenerates /root/testdata
  * between rounds and has already changed a physical type once
  * (events.ts: TIMESTAMP(NANOS)-as-INT64 → TIMESTAMP[us], round 9),
  * which surfaced as 23 scattered DATATYPE_MISMATCH failures. This
  * spec pins the post-loader schema of every table so the NEXT drift
  * fails in exactly one place with the drifted column named.
  *
  * Contract is on the NORMALIZED schema (what Tables.* returns and
  * every operator consumes), not the raw parquet footer — the raw
  * events.ts type is allowed to vary by generator vintage; the loader
  * absorbs that.
  */
class TablesContractSpec extends SparkSpec {

  private def expect(df: DataFrame, table: String, cols: (String, DataType)*): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val actualOrder = df.schema.map(_.name)
    val expectedNames = cols.map(_._1)
    assert(actualOrder == expectedNames,
      s"table $table column set/order drifted: expected $expectedNames, got $actualOrder")
    for ((name, tpe) <- cols) {
      assert(actual(name) == tpe,
        s"table $table column `$name` drifted: expected $tpe, got ${actual(name)}")
    }
  }

  test("region schema") {
    expect(Tables.region(spark, sfDir), "region",
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }

  test("nation schema") {
    expect(Tables.nation(spark, sfDir), "nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
  }

  test("customer schema") {
    expect(Tables.customer(spark, sfDir), "customer",
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
  }

  test("supplier schema") {
    expect(Tables.supplier(spark, sfDir), "supplier",
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
  }

  test("part schema") {
    expect(Tables.part(spark, sfDir), "part",
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }

  test("orders schema") {
    expect(Tables.orders(spark, sfDir), "orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
  }

  test("lineitem schema") {
    expect(Tables.lineitem(spark, sfDir), "lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
  }

  test("events schema (normalized by the loader)") {
    expect(Tables.events(spark, sfDir), "events",
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
  }

  test("documents schema") {
    expect(Tables.documents(spark, sfDir), "documents",
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType)
  }

  test("embeddings schema") {
    expect(Tables.embeddings(spark, sfDir), "embeddings",
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  }

  test("a deliberately retyped column fails with the drifted column NAMED") {
    // the point of this suite: the NEXT generator drift must die in
    // one assertion that names the column, not as 23 scattered
    // DATATYPE_MISMATCH stack traces
    val drifted = Tables.documents(spark, sfDir)
      .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id").cast("string"))
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      expect(drifted, "documents",
        "doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType)
    }
    assert(e.getMessage.contains("doc_id") && e.getMessage.contains("drifted"),
      s"drift failure must name the column: ${e.getMessage}")
    // a dropped column is likewise named (set/order branch)
    val e2 = intercept[org.scalatest.exceptions.TestFailedException] {
      expect(Tables.documents(spark, sfDir).drop("lang"), "documents",
        "doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType)
    }
    assert(e2.getMessage.contains("lang"))
  }

  test("events loader absorbs all three ts vintages") {
    // Synthesize the two non-current vintages in temp dirs and prove
    // the loader normalizes each to TimestampType with equal values.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("events-vintage").toFile
    tmp.deleteOnExit()
    val base = Tables.events(spark, sfDir)
      .orderBy("event_id").limit(50).cache()
    val wantTs = base.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap

    // NTZ vintage
    val ntzDir = s"${tmp.getAbsolutePath}/ntz"
    base.withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    val ntz = Tables.events(spark, ntzDir)
    assert(ntz.schema("ts").dataType == TimestampType)
    val ntzTs = ntz.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    assert(ntzTs == wantTs, "NTZ vintage round-trip changed ts values")

    // nanos-as-INT64 vintage (the pre-r9 generator): ts stored as long nanos
    val nanosDir = s"${tmp.getAbsolutePath}/nanos"
    base.withColumn("ts",
        org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    val nanos = Tables.events(spark, nanosDir)
    assert(nanos.schema("ts").dataType == TimestampType)
    val nanosTs = nanos.select("event_id", "ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    assert(nanosTs == wantTs, "nanos vintage round-trip changed ts values")
    base.unpersist()
  }
}
