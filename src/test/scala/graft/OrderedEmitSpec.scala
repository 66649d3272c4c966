package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingPipelines
import graft.streaming.StreamingPipelines.{Item, OrderedOut}

/** The reference's ordered output mode (encoder_spar_ord.cpp; Reorder
  * stage, encoder.c:1345): out-of-order completions must be buffered
  * and released strictly in sequence order.
  */
class OrderedEmitSpec extends SparkSpec {

  private def run(batches: Seq[Seq[Item]]): (Seq[OrderedOut], Seq[Int]) = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Item]
    val sink = s"ord_sink_${System.nanoTime()}"
    val q = StreamingPipelines.orderedEmit(source.toDS())
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    val counts = batches.map { b =>
      source.addData(b)
      q.processAllAvailable() // one micro-batch per addData
      spark.table(sink).count().toInt
    }
    val out = spark.table(sink).as[OrderedOut].collect().toSeq
    q.stop()
    (out, counts)
  }

  test("gaps hold back emission; fills release the contiguous prefix") {
    val (out, cumCounts) = run(Seq(
      Seq(Item(1, 2, "c"), Item(1, 0, "a"), Item(2, 1, "y")), // key1 gap@1, key2 gap@0
      Seq(Item(1, 1, "b"), Item(2, 0, "x"), Item(2, 2, "z"))))
    // batch 1: only key1/seq0 can be emitted (both other keys gapped)
    assert(cumCounts == Seq(1, 6))
    // per key, emission payload order is exactly seq order
    for ((k, rows) <- out.groupBy(_.key)) {
      val seqs = rows.sortBy(_.seq).map(_.seq)
      assert(seqs == (0L until seqs.size).toVector, s"key=$k seqs=$seqs")
    }
    // the gap fills in the second state update for each key
    assert(out.filter(r => r.key == 1 && r.seq > 0).forall(_.batch_emitted == 1L))
    assert(out.filter(_.key == 2).forall(_.batch_emitted == 1L))
    assert(out.find(r => r.key == 1 && r.seq == 0).get.batch_emitted == 0L)
  }

  test("redelivered below-frontier items are dropped, not re-emitted or buffered") {
    val (out, cumCounts) = run(Seq(
      Seq(Item(1, 0, "a"), Item(1, 1, "b")),
      Seq(Item(1, 0, "a")),            // at-least-once redelivery
      Seq(Item(1, 2, "c"))))           // frontier still advances cleanly
    assert(cumCounts == Seq(2, 2, 3))  // the duplicate emits nothing
    assert(out.map(r => (r.seq, r.payload)).sorted ==
      Seq((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("ordered emission matches input order under random batch shuffling") {
    val rng = new scala.util.Random(7)
    val items = for (k <- 1L to 3L; s <- 0L until 40L)
      yield Item(k, s, s"p$k-$s")
    val shuffled = rng.shuffle(items.toVector)
    val (out, _) = run(shuffled.grouped(25).toSeq)
    assert(out.size == items.size)
    for ((k, rows) <- out.groupBy(_.key)) {
      assert(rows.sortBy(_.seq).map(_.payload) ==
        (0L until 40L).map(s => s"p$k-$s").toVector, s"key=$k")
    }
  }
}
