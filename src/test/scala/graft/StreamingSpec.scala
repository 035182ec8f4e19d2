package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventStreams

/** Runs the EventStreams transforms as REAL streaming queries (file source,
  * multiple micro-batches, memory sink) and asserts batch/stream parity. */
class StreamingSpec extends GraftSuite {

  // Stage the events fixture as 4 TIME-ORDERED parquet chunks, written
  // sequentially so the file source replays them in event-time order —
  // random chunking would make whole micro-batches arrive "late" behind
  // the watermark and get dropped (partial windows ≠ batch result).
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream-").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val chunked = Tables.events(spark, sf)
      .withColumn("chunk", ntile(4).over(w))
    (1 to 4).foreach { q =>
      chunked.filter(col("chunk") === q).drop("chunk")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  private def runStream(name: String, out: DataFrame => DataFrame,
      mode: String): DataFrame = {
    val q = out(EventStreams.readEventStream(spark, streamDir))
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling window: streaming result equals batch result") {
    val streamed = runStream("t_tumbling", EventStreams.tumblingCounts,
      "append")
    val batch = EventStreams.tumblingCounts(Tables.events(spark, sf))
    // append mode emits only watermark-closed windows; every emitted row
    // must match batch, and most windows must have been emitted.
    val diff = streamed.exceptAll(batch).count()
    assert(diff === 0, "streamed rows not found in batch result")
    assert(streamed.count() >= batch.count() - 5)
  }

  test("sliding window: streaming rows are a watermark-closed subset of batch") {
    val streamed = runStream("t_sliding", EventStreams.slidingCounts, "append")
    val batch = EventStreams.slidingCounts(Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(streamed.count() > 0)
  }

  test("session window: streaming rows match batch sessionization") {
    val streamed = runStream("t_session", EventStreams.sessionCounts, "append")
    val batch = EventStreams.sessionCounts(Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(streamed.count() > 0)
  }

  test("stream-stream interval join emits a subset equal to batch rows") {
    val streamed = runStream("t_interval",
      EventStreams.purchaseViewInterval, "append")
    val batch = EventStreams.purchaseViewInterval(Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).count() === 0,
      "streamed join rows must all appear in the batch join")
    // most of the join output must have been emitted (tail withheld by
    // the final watermark is allowed)
    assert(streamed.count() >= (batch.count() * 0.9).toLong)
  }

  test("streaming dedup drops re-delivered events") {
    // Duplicate every event into a second file set → re-delivery.
    val dir = Files.createTempDirectory("graft-dedup-").toString
    val ev = Tables.events(spark, sf).limit(1000)
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir) // same event_ids again
    val q = EventStreams.dedupEvents(
        EventStreams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("t_dedup").count() === 1000)
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    val ds = EventStreams.readEventStream(spark, streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    val q = EventStreams.userRunningTotals(ds)
      .writeStream.format("memory").queryName("t_state")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    // last update per user must equal the batch per-user totals
    val lastPerUser = spark.table("t_state")
      .groupBy("user_id").agg(max(col("n_events")).as("n_events"))
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(lastPerUser.exceptAll(batch).count() === 0)
    assert(lastPerUser.count() === batch.count())
  }
}
