package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * helpers cover the cases AQE can't: broadcast-side replication for
  * skewed equi-joins, and two-level (partial → final) aggregation when
  * one grouping key dominates.
  */
object SkewFns {

  /** Salted equi-join of a skewed large side against a small side:
    * the large side gets a deterministic salt in [0, salts) derived
    * from stable row attributes, the small side is exploded `salts`
    * times, and the join key becomes (key, salt) — a hot key's rows
    * spread over `salts` reducers instead of one.
    *
    * `saltSource` must be a column of the large side that varies
    * within a hot key (a row id, a hash of the payload). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-level aggregation for skewed group keys: pre-aggregate on
    * (key, salt), then merge the partials per key. `merge` must be an
    * associative re-aggregation of the partial column (sum over
    * partial sums/counts). */
  def saltedCount(df: DataFrame, key: String, saltSource: Column,
                  salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
