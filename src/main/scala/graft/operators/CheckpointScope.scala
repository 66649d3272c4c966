package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Self-cleaning eager-checkpoint scope for iterative operators.
  *
  * Every eager localCheckpoint persists RDD blocks that outlive the
  * call unless freed — in a long-running session an operator that
  * leaks its round blocks taxes every later job (measured 4× on
  * neighbors in a full bench sweep). The freed set is EXACTLY the
  * checkpoints created through the scope's `ck` function — a
  * set-difference against a persisted-set snapshot would also free a
  * CALLER's lazily-checkpointed input if it first materialized inside
  * the scope, truncating its lineage out from under it.
  *
  * The caller's RESULT must be materialized by its own
  * `localCheckpoint(true)` OUTSIDE `ck` (or be collected) before the
  * scope exits — blocks created through `ck` are gone the moment
  * `scoped` returns. Consumers: [[Curation.clustersFromPairs]],
  * [[GraphOps.pagerankFromPairs]], [[GraphOps.graphTriangles]].
  */
private[graft] object CheckpointScope {

  def scoped[T](spark: org.apache.spark.sql.SparkSession)(
      body: (DataFrame => DataFrame) => T): T = {
    val sc = spark.sparkContext
    val created = scala.collection.mutable.Set[Int]()
    def ck(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true)
      c.queryExecution.logical.collect {
        case l: LogicalRDD => created += l.rdd.id
      }
      c
    }
    try body(ck)
    finally sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (created.contains(id)) rdd.unpersist(blocking = false)
    }
  }
}
