package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.streaming.Streaming.{Event, SessionOut}

/** Driver-failure recovery: the property a 1000-executor deployment
  * actually depends on. MemoryStream specs prove state SEMANTICS but
  * cannot prove recovery — a MemoryStream is not replayable across
  * restarts. This spec drives [[Streaming.sessionizeStream]] from a
  * parquet FILE source through a stop/restart cycle on one
  * checkpoint, with a parquet FILE sink, and pins the three recovery
  * guarantees:
  *
  *  1. state restoration — a session whose events straddle the
  *     restart emerges as ONE merged session (n_events counts events
  *     from both runs), which is only possible if the state store
  *     was rebuilt from the checkpoint;
  *  2. source exactly-once — files processed before the stop are not
  *     re-read after it (no double-counted events);
  *  3. sink exactly-once — a restart with nothing new appends
  *     nothing (the file sink's metadata log deduplicates batches).
  */
class CheckpointRestartSpec extends SparkSpec {

  private val GapMs = 30L * 60 * 1000 // 30-minute session gap

  // offset off epoch 0: the initial watermark is 0 ms, and a row AT
  // the watermark is dropped as late — an event at exactly epoch 0
  // would silently vanish in the first micro-batch
  private val BaseMs = 24L * 3600 * 1000

  private def ts(min: Long): Timestamp = new Timestamp(BaseMs + min * 60 * 1000)

  test("sessionizeStream restarted from checkpoint merges a session spanning the restart, exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt_restart").toFile
    val inDir = new java.io.File(root, "in"); inDir.mkdirs()
    val outDir = new java.io.File(root, "out")
    val ckptDir = new java.io.File(root, "ckpt")

    def append(events: Seq[Event]): Unit =
      events.toDS().coalesce(1).write.mode("append").parquet(inDir.getPath)

    def runOnce(): Unit = {
      val src: Dataset[Event] = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
        .parquet(inDir.getPath)
        .as[Event]
      val q: StreamingQuery =
        Streaming.sessionizeStream(src, GapMs, watermarkDelay = "10 minutes")
          .writeStream
          .format("parquet")
          .option("checkpointLocation", ckptDir.getPath)
          .option("path", outDir.getPath)
          .outputMode("append")
          .start()
      try q.processAllAvailable() finally q.stop()
    }

    def sessions(): Seq[SessionOut] =
      // reading a file-sink directory goes through its _spark_metadata
      // commit log, so only committed batches are visible
      spark.read.parquet(outDir.getPath).as[SessionOut].collect().toSeq

    // run 1: user 1 opens a session (events at 0 and 5 min) — stays
    // open in the state store when the query stops
    append(Seq(
      Event(1L, ts(0), 1L, "view", 1.0),
      Event(2L, ts(5), 1L, "click", 1.0)))
    runOnce()
    assert(sessions().isEmpty, "session must still be open at first stop")

    // run 2 (same checkpoint): an event at 10 min lands WITHIN the
    // 30-min gap of the restored session — merge proves recovery —
    // and a far-future sentinel pushes the watermark past the
    // session's end + gap so the event-time timeout emits it
    append(Seq(
      Event(3L, ts(10), 1L, "view", 1.0),
      Event(90L, ts(600), 99L, "view", 1.0)))
    runOnce()

    val afterRestart = sessions().filter(_.user_id == 1L)
    assert(afterRestart.size == 1,
      s"expected exactly one merged session, got $afterRestart")
    val s = afterRestart.head
    assert(s.n_events == 3, // 2 pre-restart + 1 post-restart events
      s"state not restored across restart: $s")
    assert(s.start_ms == ts(0).getTime && s.end_ms == ts(10).getTime, s.toString)

    // run 3: nothing new — a clean restart must not re-emit or
    // re-read anything
    runOnce()
    assert(sessions().filter(_.user_id == 1L) == afterRestart,
      "restart with no new data changed the committed output")
  }
}
