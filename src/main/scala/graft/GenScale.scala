package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-factor step-up generator: writes an N×-scaled
  * copy of a driver-generated testdata directory by sharding every
  * FACT table N ways with disjoint key ranges (dimension tables
  * region/nation stay single-copy — their cardinality is fixed by the
  * schema, as in TPC-H).
  *
  * The point is the sf0.1 → sf1 per-query scaling-ratio table (SURVEY
  * §9's empirical check): a hidden super-linear stage (candidate-set
  * blowup in an LSH path, an accidental all-pairs, an unpartitioned
  * window) shows up as a ratio far above the ~10× data growth.
  * Shard-perturbation design keeps the scaled corpus REALISTIC for
  * that purpose:
  *
  *  - `documents`: shard 0 is byte-identical to the source; shard
  *    i ≥ 1 applies a per-shard token BIJECTION (every token with
  *    xxhash64(token) % 3 == 0 gets a shard-unique suffix). A token
  *    remap preserves within-shard token-set similarity EXACTLY
  *    (near-dup pair density per shard equals the source corpus — so
  *    total near-dup pairs scale linearly, the realistic model of a
  *    bigger crawl), while cross-shard copies of the same base doc
  *    land at Jaccard ≈ 0.5 — below the 0.7 near-dup threshold, so
  *    no artificial cross-shard dup cliques (which would grow
  *    super-linearly BY CONSTRUCTION and measure the generator, not
  *    the engine). n_chars is recomputed from the mutated text.
  *  - `embeddings`: shard i ≥ 1 adds a deterministic ±1e-4 per-element
  *    perturbation — cluster geometry (IVF cells, label centroids)
  *    is preserved, exact-duplicate vectors across shards are not
  *    (which would blow up embedding-dedup super-linearly).
  *  - `events`: user_id/event_id offset per shard, timestamps kept —
  *    10× events over the SAME time span (a denser stream, the
  *    realistic model); per-user event density is unchanged so
  *    window/session state scales linearly in users.
  *  - TPC-H facts: every foreign key offsets consistently
  *    (orders↔lineitem, customer, part, supplier); nation/region
  *    references unchanged.
  *
  * Usage: runMain graft.GenScale <srcDir> <outDir> [shards=10]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val shards = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.contractLocal("graft-genscale")
    try generate(spark, srcDir, outDir, shards)
    finally spark.stop()
  }

  def generate(s: SparkSession, srcDir: String, outDir: String, shards: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // dimension tables: fixed cardinality, copied once
    Seq("region", "nation").foreach { t =>
      s.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

    /** Disjoint key ranges per shard: offset unit = max(key) + 1 of
      * the SOURCE table, computed from the data so the generator
      * never hardcodes a vintage's cardinality. */
    def offsetUnit(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect()(0).getLong(0) + 1L

    def shardUnion(src: DataFrame)(mk: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until shards).map(i => mk(src, i)).reduce(_ unionAll _)

    // ---- documents: per-shard token bijection --------------------------
    val docs = s.read.parquet(s"$srcDir/documents.parquet")
    val docUnit = offsetUnit(docs, "doc_id")
    shardUnion(docs) { (d, i) =>
      val mutated =
        if (i == 0) d
        else d.withColumn("text",
          array_join(transform(split(col("text"), " "), t =>
            when(pmod(xxhash64(t), lit(3)) === 0,
              concat(t, lit(s"q$i"))).otherwise(t)), " "))
          .withColumn("n_chars", length(col("text")).cast("long"))
      mutated.withColumn("doc_id", col("doc_id") + lit(i * docUnit))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }.repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // ---- embeddings: per-shard epsilon perturbation --------------------
    val emb = s.read.parquet(s"$srcDir/embeddings.parquet")
    val vecUnit = offsetUnit(emb, "vec_id")
    shardUnion(emb) { (e, i) =>
      val v =
        if (i == 0) e
        else e.withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            (x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(2001)) - 1000)
              .cast("float") / lit(1e7f)).cast("float")))
      v.withColumn("vec_id", col("vec_id") + lit(i * vecUnit))
        .select("vec_id", "embedding", "label")
    }.repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // ---- events: user/event offsets, same time span --------------------
    val events = s.read.parquet(s"$srcDir/events.parquet")
    val evUnit = offsetUnit(events, "event_id")
    val userUnit = offsetUnit(events, "user_id")
    shardUnion(events) { (e, i) =>
      e.withColumn("event_id", col("event_id") + lit(i * evUnit))
        .withColumn("user_id", col("user_id") + lit(i * userUnit))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }.repartition(32).write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // ---- TPC-H facts: consistent FK offsets ----------------------------
    val cust = s.read.parquet(s"$srcDir/customer.parquet")
    val supp = s.read.parquet(s"$srcDir/supplier.parquet")
    val part = s.read.parquet(s"$srcDir/part.parquet")
    val orders = s.read.parquet(s"$srcDir/orders.parquet")
    val li = s.read.parquet(s"$srcDir/lineitem.parquet")
    val custUnit = offsetUnit(cust, "c_custkey")
    val suppUnit = offsetUnit(supp, "s_suppkey")
    val partUnit = offsetUnit(part, "p_partkey")
    val orderUnit = offsetUnit(orders, "o_orderkey")
    shardUnion(cust) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * custUnit))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    }.repartition(8).write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    shardUnion(supp) { (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppUnit))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    }.repartition(4).write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    shardUnion(part) { (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * partUnit))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    }.repartition(8).write.mode("overwrite").parquet(s"$outDir/part.parquet")
    shardUnion(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderUnit))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custUnit))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
    }.repartition(16).write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    shardUnion(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderUnit))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partUnit))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppUnit))
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
    }.repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    System.err.println(s"[genscale] wrote ${shards}x of $srcDir to $outDir")
  }
}
