package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingPipelines

/** End-to-end proof of the composed 5-stage dedup pipeline
  * (Fragment→Refine→Deduplicate→Compress→Reorder): streamed in
  * micro-batches it must chunk exactly like the batch operators,
  * converge the digest store to one first per distinct content,
  * restore every document byte-exactly from the emitted archive
  * (dedup_restore parity), and emit a dense global sequence in
  * (doc_id, chunk_idx) order. */
class FiveStageSpec extends SparkSpec {

  test("five-stage pipeline: chunk parity, restore parity, ordered emit, store convergence") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val storeDir =
      s"${System.getProperty("java.io.tmpdir")}/graft_5stage_spec_${System.nanoTime()}"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    try {
      val source =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val stage = StreamingPipelines.fiveStageBatch(spark, storeDir) _
      val q = source.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          out.synchronized { out ++= stage(b.toDF(), id).collect() }: Unit
        }
        .start()
      // three ordered micro-batches, drained one at a time
      docs.grouped(docs.length / 3 + 1).foreach { g =>
        source.addData(g.toSeq)
        q.processAllAvailable()
      }
      q.stop()

      // 1. chunk parity: the streamed pipeline chunks exactly like the
      // batch chunk table
      val streamed = out.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk_sha"))).toSet
      val batchChunks = Dedup.dedupChunk(spark, sfDir)
        .select("doc_id", "chunk_idx", "chunk_sha").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(streamed == batchChunks,
        s"chunk drift: +${streamed.diff(batchChunks).size} -${batchChunks.diff(streamed).size}")

      // 2. store convergence: exactly one is_first per distinct digest,
      // and firsts cover every digest (the archive dictionary is complete)
      val firsts = out.filter(_.getAs[Boolean]("is_first"))
      val firstShas = firsts.map(_.getAs[String]("chunk_sha"))
      assert(firstShas.distinct.size == firstShas.size, "digest compressed twice")
      assert(firstShas.toSet == streamed.map(_._3), "archive dictionary incomplete")
      // firsts carry payload + deflate length; duplicates only the reference
      assert(firsts.forall(r => r.getAs[Array[Byte]]("piece") != null &&
        r.getAs[Int]("comp_len") > 0))
      assert(out.filter(!_.getAs[Boolean]("is_first"))
        .forall(r => r.isNullAt(r.fieldIndex("piece")) &&
          r.isNullAt(r.fieldIndex("comp_len"))))

      // 3. restore parity (the dedup_restore check, cross-stream):
      // reassemble every doc from the archive and compare digests
      val dict = firsts.map(r =>
        r.getAs[String]("chunk_sha") -> r.getAs[Array[Byte]]("piece")).toMap
      val textSha = docs.map { case (id, t) =>
        id -> java.security.MessageDigest.getInstance("SHA-256")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.toMap
      out.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
        val restored = rows.sortBy(_.getAs[Int]("chunk_idx"))
          .flatMap(r => dict(r.getAs[String]("chunk_sha"))).toArray
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(restored).map("%02x".format(_)).mkString
        assert(sha == textSha(id), s"doc $id failed to restore byte-exactly")
      }

      // 4. ordered emission: emit_seq is dense 0..N-1 across all
      // batches and follows (doc_id, chunk_idx) order
      val seqs = out.map(_.getAs[Long]("emit_seq")).sorted
      assert(seqs == (0L until out.size.toLong).toSeq, "emit_seq not dense")
      val inEmitOrder = out.sortBy(_.getAs[Long]("emit_seq"))
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx")))
      assert(inEmitOrder == inEmitOrder.sorted, "emit order != (doc_id, chunk_idx) order")

      // 5. cross-query convergence: replaying the same docs against the
      // SAME store finds zero new content (every chunk is a duplicate)
      // (collect eagerly: the NEXT stage() call frees this batch's
      // checkpoint blocks, after which the frame cannot re-evaluate)
      val replay = stage(spark.createDataFrame(docs.toSeq).toDF("doc_id", "text"), 99L)
        .collect()
      assert(replay.count(_.getAs[Boolean]("is_first")) == 0,
        "store did not converge: replay found new digests")

      // 6. at-least-once REDELIVERY of the last epoch (same epoch id,
      // same data — the crash-after-store-advance case): the output
      // must be row-identical to the first delivery — same is_first
      // classification (store advanced by the failed attempt must not
      // reclassify the batch all-duplicate) and the SAME emit_seq
      // range (no hole in the dense sequence) — and the digest store
      // must not grow
      val digests = spark.read.parquet(s"$storeDir/digests")
        .select("chunk_sha").distinct().count()
      val redelivered = stage(
        spark.createDataFrame(docs.toSeq).toDF("doc_id", "text"), 99L).collect()
      assert(redelivered.map(_.toSeq).toSet == replay.map(_.toSeq).toSet,
        "redelivered epoch did not reproduce the original delivery")
      assert(spark.read.parquet(s"$storeDir/digests")
        .select("chunk_sha").distinct().count() == digests,
        "redelivery grew the digest store")
    } finally {
      StreamingPipelines.deleteRecursively(new java.io.File(storeDir))
    }
  }

  test("five-stage pipeline: restart resumes the store and the emit frontier") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val storeDir =
      s"${System.getProperty("java.io.tmpdir")}/graft_5stage_restart_${System.nanoTime()}"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    val (half1, half2) = docs.splitAt(docs.length / 2)
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    def runQuery(batch: Array[(Long, String)]): Unit = {
      val source =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val stage = StreamingPipelines.fiveStageBatch(spark, storeDir) _
      val q = source.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          out.synchronized { out ++= stage(b.toDF(), id).collect() }: Unit
        }
        .start()
      source.addData(batch.toSeq)
      q.processAllAvailable()
      q.stop() // simulate a shutdown: only the parquet store survives
    }
    try {
      runQuery(half1)
      runQuery(half2) // a NEW query against the SAME store + frontier
      // the union of both queries' outputs is indistinguishable from a
      // single uninterrupted run: one first per digest, dense global
      // emit_seq continuing across the restart, full chunk coverage
      val firstShas = out.filter(_.getAs[Boolean]("is_first"))
        .map(_.getAs[String]("chunk_sha"))
      assert(firstShas.distinct.size == firstShas.size,
        "restart re-compressed an already-stored digest")
      assert(firstShas.toSet ==
        out.map(_.getAs[String]("chunk_sha")).toSet, "dictionary incomplete")
      val seqs = out.map(_.getAs[Long]("emit_seq")).sorted
      assert(seqs == (0L until out.size.toLong).toSeq,
        "emit frontier did not resume across restart")
      val streamed = out.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk_sha"))).toSet
      val batchChunks = graft.operators.Dedup.dedupChunk(spark, sfDir)
        .select("doc_id", "chunk_idx", "chunk_sha").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(streamed == batchChunks)
    } finally {
      StreamingPipelines.deleteRecursively(new java.io.File(storeDir))
    }
  }
}
