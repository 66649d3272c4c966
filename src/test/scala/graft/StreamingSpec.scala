package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{Relational, StreamingOps}
import graft.streaming.StreamingPipelines
import graft.streaming.StreamingPipelines.Ev

class StreamingSpec extends SparkSpec {

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
  }

  test("streaming session_window TVF matches batch q_session_tvf cell-for-cell") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    val source = MemoryStream[Ev]
    // session windows stream in APPEND mode only: a session emits
    // once, when the watermark passes its end. The watermark is
    // GLOBAL (max event time − delay, across all keys), so ONE
    // far-future sentinel event finalizes every user's real sessions;
    // its own session never emits and is filtered from the compare.
    val maxTs = evs.map(_.ts.getTime).max
    val sentinelMs = maxTs + 24L * 3600 * 1000
    val q = StreamingPipelines.sessionTvfAgg(source.toDF())
      .writeStream.format("memory").queryName("stvf_sink")
      .outputMode(OutputMode.Append()).start()
    evs.grouped(300).foreach(source.addData(_))
    q.processAllAvailable()
    source.addData(Seq(Ev(-1L, new Timestamp(sentinelMs), 0L, "sentinel", 0.0)))
    q.processAllAvailable()
    val stream = spark.table("stvf_sink")
      .filter(col("start_us") < lit(sentinelMs * 1000L))
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toString).sorted.toSeq
    q.stop()
    val batch = Relational.qSessionTvf(spark, sfDir)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toString).sorted.toSeq
    assert(stream == batch,
      s"session TVF stream/batch diverged: ${stream.size} vs ${batch.size} rows")
  }

  test("streaming windowAgg matches batch q_events_window totals") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.windowAgg(source.toDF())
      .writeStream.format("memory").queryName("wa_sink")
      .outputMode(OutputMode.Update()).start()
    evs.grouped(300).foreach(source.addData(_))
    q.processAllAvailable()
    // Update mode: latest row per (window, event_type) is the final agg
    val sink = spark.table("wa_sink")
      .groupBy("window", "event_type").agg(last("n_events").as("n_events"))
    val streamTotal = sink.agg(sum("n_events")).collect().head.getLong(0)
    q.stop()
    assert(streamTotal == evs.size.toLong)
    val batchGroups = Relational.qEventsWindow(spark, sfDir).count()
    assert(sink.count() == batchGroups)
  }

  test("streaming slidingAgg matches batch q_hop_window cell-for-cell") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.slidingAgg(source.toDF())
      .writeStream.format("memory").queryName("sa_sink")
      .outputMode(OutputMode.Update()).start()
    evs.grouped(300).foreach(source.addData(_))
    q.processAllAvailable()
    val sink = spark.table("sa_sink")
      .groupBy("window", "event_type")
      .agg(last("n_events").as("n_events"), last("sum_value").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    val stream = sink.collect().map(_.toString).sorted.toSeq
    q.stop()
    val batch = operators.Relational.qHopWindow(spark, sfDir)
      .drop("n_users") // countDistinct is not allowed in streaming agg
      .collect().map(_.toString).sorted.toSeq
    assert(stream == batch, "streaming sliding agg diverged from batch mirror")
  }

  test("streaming dedup emits one row per (user_id, event_type) key") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.dedupStream(source.toDF())
      .writeStream.format("memory").queryName("dd_sink")
      .outputMode(OutputMode.Append()).start()
    evs.grouped(300).foreach(source.addData(_))
    q.processAllAvailable()
    val sinkKeys = spark.table("dd_sink").select("user_id", "event_type").distinct().count()
    val sinkRows = spark.table("dd_sink").count()
    q.stop()
    val batchKeys = StreamingOps.streamDedupBatch(spark, sfDir).count()
    assert(sinkRows == sinkKeys, "dedup emitted a duplicate key")
    assert(sinkKeys == batchKeys)
  }

  test("streaming sessionize matches batch qSessionize") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    // sentinel far in the future pushes the watermark past every
    // session's gap horizon so all real sessions close
    val lastTs = evs.last.ts.getTime
    val sentinel = Ev(-1L, new Timestamp(lastTs + 86400000L), -999L, "sentinel", 0.0)
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append()).start()
    evs.grouped(300).foreach(source.addData(_))
    source.addData(Seq(sentinel))
    q.processAllAvailable()
    val streamed = spark.table("sess_sink")
      .filter(col("user_id") =!= -999L)
      .select("user_id", "sess_id", "n_events", "start_us", "end_us")
    val batch = Relational.qSessionize(spark, sfDir)
      .select("user_id", "sess_id", "n_events", "start_us", "end_us")
    val onlyStream = streamed.exceptAll(batch).count()
    val onlyBatch = batch.exceptAll(streamed).count()
    q.stop()
    assert(onlyStream == 0 && onlyBatch == 0,
      s"session mismatch: $onlyStream stream-only, $onlyBatch batch-only")
  }

  test("sessionize: sess_id numbering survives a mid-stream timeout") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L // ms
    def ev(id: Long, user: Long, offsetMin: Long): Ev =
      Ev(id, new Timestamp(t0 + offsetMin * 60000L), user, "view", 1.0)
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_timeout_sink")
      .outputMode(OutputMode.Append()).start()
    // one processAllAvailable per addData forces REAL micro-batch
    // boundaries — batched adds coalesce and the timeout never fires
    // batch 1: user 7001 starts session 1; user 7002 keeps the stream alive
    source.addData(Seq(ev(1, 7001, 0), ev(2, 7002, 0))); q.processAllAvailable()
    // batch 2: 7002 advances the watermark past 7001's gap horizon
    source.addData(Seq(ev(3, 7002, 120))); q.processAllAvailable()
    // batch 3: 7001 has NO data here → its session must close via the
    // EventTimeTimeout path (the state-loss bug under test)
    source.addData(Seq(ev(4, 7002, 180))); q.processAllAvailable()
    val afterTimeout = spark.table("sess_timeout_sink")
      .filter(col("user_id") === 7001L).count()
    assert(afterTimeout == 1, "session 1 must close via the timeout path")
    // batch 4: a LATER event for 7001 → must continue as session 2
    source.addData(Seq(ev(5, 7001, 240))); q.processAllAvailable()
    // sentinel pushes the watermark far enough to close everything
    source.addData(Seq(ev(6, 7003, 1440))); q.processAllAvailable()
    val sess7001 = spark.table("sess_timeout_sink")
      .filter(col("user_id") === 7001L)
      .orderBy("sess_id").collect()
    q.stop()
    assert(sess7001.map(_.getAs[Long]("sess_id")).toSeq == Seq(1L, 2L),
      s"expected sessions 1,2 for user 7001, got ${sess7001.mkString(", ")}")
    assert(sess7001.forall(_.getAs[Long]("n_events") == 1L))
  }

  test("throughput harness returns sane metrics with a per-stage breakdown") {
    val evs = loadEvents().take(600)
    val r = StreamingPipelines.throughputBench(spark, evs, 200, "spec",
      StreamingPipelines.windowAgg)
    assert(r.rows_in == 600 && r.batches == 3)
    assert(r.rows_per_sec > 0 && r.rows_out > 0)
    // per-stage latency breakdown (the reference's per-stage service
    // time dump): phases nest inside the trigger wall-clock, and a
    // stateful pipeline must report state-store time
    assert(r.trigger_ms_p50 > 0)
    assert(r.exec_ms_p50 <= r.trigger_ms_p50)
    assert(r.plan_ms_p50 >= 0 && r.getbatch_ms_p50 >= 0)
    assert(r.state_update_ms_p50 >= 0 && r.state_commit_ms_p50 >= 0)
    // the r15 semantic gate: every feed row measured as ingested, and
    // the run verdict rides the row (r14 verdict #7)
    assert(r.ingested_rows == r.rows_in && r.rate_ok)
    // windowAgg is stateful: at least one batch paid a store commit
    val rows = spark.createDataFrame(Seq(r))
    Seq("getbatch_ms_p50", "trigger_ms_p50", "state_update_ms_p50",
      "state_commit_ms_p50").foreach(c => assert(rows.columns.contains(c)))
  }

  test("param sweep: one row per grid cell, all cells measured") {
    val res = StreamingOps.streamParamSweep(spark, sfDir).collect()
    // 2 batch sizes x 3 pipelines + 2 parallelism cells on sessionize
    assert(res.length == 8)
    assert(res.map(r => (r.getAs[String]("pipeline"), r.getAs[Int]("batch_size"),
      r.getAs[Int]("state_partitions"))).distinct.length == 8)
    res.foreach { r =>
      assert(r.getAs[Double]("rows_per_sec") > 0)
      assert(r.getAs[Long]("rows_in") > 0)
      assert(r.getAs[Long]("batches") > 0)
      assert(r.getAs[Int]("state_partitions") > 0)
      assert(r.getAs[Boolean]("rate_ok"), s"cell failed its harness gate: $r")
    }
    // the replica-count axis (reference -t knob): both swept cells
    // exist and processed the full feed
    val par = res.filter(r => r.getAs[String]("pipeline") == "sessionize" &&
      r.getAs[Int]("batch_size") == 2000)
    assert(par.map(_.getAs[Int]("state_partitions")).toSet.size >= 2)
  }

  test("agg maintenance: appended partials serve the exact running aggregate") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_agg_store").toFile
    val storePath = new java.io.File(dir, "store").getAbsolutePath
    val source = MemoryStream[(String, String, Double)]
    val q = source.toDF().toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
      .writeStream
      .foreachBatch(StreamingPipelines.aggMaintenance(spark, storePath) _)
      .outputMode(OutputMode.Append()).start()
    // three batches: same (day, type) groups recur across batches, so
    // the serve view must genuinely MERGE partials, not just union rows
    val batches = Seq(
      Seq(("2024-01-01 10:00:00", "view", 1.5), ("2024-01-01 11:00:00", "view", 2.5),
        ("2024-01-02 09:00:00", "buy", 10.0)),
      Seq(("2024-01-01 12:00:00", "view", 4.0), ("2024-01-02 10:00:00", "buy", 0.5)),
      Seq(("2024-01-03 08:00:00", "view", 7.25), ("2024-01-01 13:00:00", "view", 0.25)))
    var fed = Seq.empty[(String, String, Double)]
    batches.foreach { b =>
      source.addData(b)
      q.processAllAvailable()
      fed = fed ++ b
      // batch mirror over everything fed so far
      val mirror = fed.toDF("ts_s", "event_type", "value")
        .select(col("ts_s").cast("timestamp").as("ts"),
          col("event_type"), col("value"))
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,4)")).cast("double").as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .collect().map(_.toString).sorted.toSeq
      val served = StreamingPipelines.aggServe(spark, storePath)
        .collect().map(_.toString).sorted.toSeq
      assert(served == mirror, s"serve view diverged after ${fed.size} rows")
    }
    q.stop()
    // segments are immutable partials: one-or-more files per epoch,
    // and the store row count exceeds the group count (merge is real)
    val segRows = spark.read.parquet(storePath).count()
    val groups = StreamingPipelines.aggServe(spark, storePath).count()
    assert(segRows > groups, "no recurring group ever merged — spec is vacuous")
    StreamingPipelines.deleteRecursively(dir)
  }

  test("upsert maintenance: serve view is latest-per-key, late rows absorbed") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_store").toFile
    val storePath = new java.io.File(dir, "store").getAbsolutePath
    val source = MemoryStream[(Long, String, Long, String, Double)]
    val q = source.toDF().toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .writeStream
      .foreachBatch(StreamingPipelines.upsertMaintenance(spark, storePath) _)
      .outputMode(OutputMode.Append()).start()
    // batch 2 updates a key from batch 1; batch 3 redelivers an OLDER
    // row for that key (late data) which must NOT displace the newer
    // stored row, plus a same-ts tie broken by event_id
    val batches = Seq(
      Seq((1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
        (2L, "2024-01-01 11:00:00", 7L, "click", 2.0),
        (3L, "2024-01-01 12:00:00", 8L, "view", 3.0)),
      Seq((4L, "2024-01-02 09:00:00", 7L, "view", 4.0),
        (5L, "2024-01-02 10:00:00", 9L, "buy", 5.0)),
      Seq((6L, "2024-01-01 08:00:00", 7L, "view", 6.0),
        (7L, "2024-01-02 10:00:00", 9L, "buy", 7.0)))
    var fed = Seq.empty[(Long, String, Long, String, Double)]
    batches.foreach { b =>
      source.addData(b)
      q.processAllAvailable()
      fed = fed ++ b
      val mirror = fed.toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("event_type"))
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1).drop("rn")
        .collect().map(_.toString).sorted.toSeq
      val served = StreamingPipelines.upsertServe(spark, storePath)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect().map(_.toString).sorted.toSeq
      assert(served == mirror, s"serve view diverged after ${fed.size} rows")
    }
    q.stop()
    // the late row (event 6) lost to the stored newer row (event 4),
    // and the same-ts tie (7 vs 5) resolved to the higher event_id
    val kept = StreamingPipelines.upsertServe(spark, storePath)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))
        -> r.getAs[Long]("event_id")).toMap
    assert(kept((7L, "view")) == 4L, s"late row displaced the newer one: $kept")
    assert(kept((9L, "buy")) == 7L, s"same-ts tie not broken by event_id: $kept")
    // segments are immutable: more stored rows than live keys
    assert(spark.read.parquet(storePath).count() >
      StreamingPipelines.upsertServe(spark, storePath).count())
    StreamingPipelines.deleteRecursively(dir)
  }

  test("incremental ingest: digest store converges to earliest-arrival uniques") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_store").toFile
    val storePath = new java.io.File(dir, "store").getAbsolutePath
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingPipelines.incrementalIngest(spark, storePath) _)
      .outputMode(OutputMode.Append()).start()
    // one processAllAvailable per addData → real micro-batch boundaries
    // batch 1: duplicate content WITHIN the batch → min doc_id wins
    source.addData(Seq((10L, "alpha"), (11L, "alpha"), (12L, "beta")))
    q.processAllAvailable()
    // batch 2: duplicate of the store ("beta") → dropped; new "gamma"
    source.addData(Seq((20L, "beta"), (21L, "gamma")))
    q.processAllAvailable()
    // batch 3: everything already stored → appends nothing
    source.addData(Seq((30L, "alpha"), (31L, "gamma")))
    q.processAllAvailable()
    q.stop()
    val store = spark.read.parquet(storePath)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(store == Set(10L, 12L, 21L),
      s"store must hold earliest arrival per distinct content, got $store")
    StreamingPipelines.deleteRecursively(dir)
  }

  test("near-dup incremental ingest: band store admits novel, rejects exact and near") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_store").toFile
    val storeDir = new java.io.File(dir, "ndstore").getAbsolutePath
    // 40 distinct tokens: a one-token edit gives jaccard 39/41 ≈ 0.95,
    // far above the 0.7 gate and (deterministically) band-colliding
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = ((1 to 39).map(i => s"w$i") :+ "w99").mkString(" ")
    val other = (101 to 140).map(i => s"v$i").mkString(" ")
    val novel = (201 to 240).map(i => s"u$i").mkString(" ")
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingPipelines.incrementalIngestNd(spark, storeDir) _)
      .outputMode(OutputMode.Append()).start()
    // batch 1 (empty store): exact pair collapses to its rep, both contents admit
    source.addData(Seq((10L, base), (11L, base), (12L, other)))
    q.processAllAvailable()
    // batch 2: near-dup of 10 rejected, exact copy of base rejected, novel admits
    source.addData(Seq((20L, near), (21L, base), (22L, novel)))
    q.processAllAvailable()
    // batch 3: replays of stored contents reject; near-dup of novel rejects
    source.addData(Seq((30L, other),
      (31L, ((201 to 239).map(i => s"u$i") :+ "u999").mkString(" "))))
    q.processAllAvailable()
    q.stop()
    val reps = spark.read.parquet(s"$storeDir/reps")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(reps == Set(10L, 12L, 22L), s"store reps wrong: $reps")
    val dec = spark.read.parquet(s"$storeDir/decisions").collect()
      .map(r => r.getAs[Long]("batch_doc") ->
        (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"),
          r.getAs[Boolean]("admitted"),
          Option(r.getAs[java.lang.Long]("best_store_doc")).map(_.toLong)))
      .toMap
    assert(dec(10L) == ((false, false, true, None)), s"10: ${dec(10L)}")
    assert(dec(12L) == ((false, false, true, None)), s"12: ${dec(12L)}")
    assert(dec(20L)._2 && !dec(20L)._3 && dec(20L)._4.contains(10L),
      s"near-dup 20 must reject against store doc 10: ${dec(20L)}")
    assert(dec(21L)._1 && !dec(21L)._3, s"exact copy 21 must reject: ${dec(21L)}")
    assert(dec(22L) == ((false, false, true, None)), s"22: ${dec(22L)}")
    assert(dec(30L)._1 && !dec(30L)._3, s"replayed 30 must reject: ${dec(30L)}")
    assert(dec(31L)._2 && !dec(31L)._3 && dec(31L)._4.contains(22L),
      s"near-dup 31 must reject against store doc 22: ${dec(31L)}")
    // exact copy of a stored doc ALSO band-collides at jaccard 1.0 —
    // the sha probe wins the classification, the probe proves recall
    assert(dec(21L)._4.contains(10L) || dec(21L)._4.isEmpty)
    // band store only holds admitted reps
    val bandDocs = spark.read.parquet(s"$storeDir/bands")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(bandDocs == Set(10L, 12L, 22L), s"band store wrong: $bandDocs")
    StreamingPipelines.deleteRecursively(dir)
  }

  test("stream_soak: rate-source soak samples per-trigger state, plateau forms") {
    // short spec-scale soak (~15 s): long enough for the first 5 s
    // windows to close and eviction to begin — the full-length run is
    // the stream_soak entry / the PLANS.md r11 evidence run
    val rows = StreamingPipelines.rateSoak(spark, soakSecs = 15,
      rowsPerSec = 5000, nKeys = 200)
    assert(rows.size >= 8, s"too few triggers sampled: ${rows.size}")
    assert(rows.forall(_.state_rows >= 0))
    assert(rows.exists(_.state_rows > 0), "state never materialized")
    assert(rows.exists(_.watermark_present), "watermark never advanced")
    // state is watermark-bounded: never more than live-window capacity
    // (ceil((window+delay)/window)+1 windows x keys, with slack for a
    // trigger observed mid-eviction)
    val cap = 4L * 200
    assert(rows.forall(_.state_rows <= cap),
      s"state exceeded the watermark bound: ${rows.map(_.state_rows).max} > $cap")
    // the curve must not grow monotonically to the end: the final
    // sample stays within the plateau band of the peak
    val peak = rows.map(_.state_rows).max
    assert(rows.last.state_rows <= peak,
      "state still growing at soak end")
  }
}
