package graft.streaming

import graft.SparkSpec

/** The streaming twins must reproduce their batch (oracle-checked) forms. */
class EventsSpec extends SparkSpec {

  test("streaming tumbling windows equal the batch q33 result") {
    val q = Events.streamingTumbling(spark, sfDir, "stream_tumbling")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_tumbling")
      .orderBy("wstart", "event_type").collect().toSeq
    val batch = Events.q33Tumbling(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming sessions emit exactly the closed batch sessions") {
    val q = Events.streamingSessions(spark, sfDir, "stream_sessions")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_sessions")
      .select("user_id", "session_start_s", "session_end_s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Events.q35Sessions(spark, sfDir)
      .select("user_id", "session_start_s", "session_end_s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty)
    // every emitted session is a true batch session (the final open
    // session per user flushes only on timeout, so ⊆ not =)
    assert(streamed.subsetOf(batch), s"${streamed.diff(batch).take(3)} not in batch")
    // and all but at most one session per user were emitted
    val users = batch.map(_._1)
    assert(streamed.size >= batch.size - users.size)
  }

  test("batch dedup keeps exactly one row per key") {
    val deduped = Events.q36DedupEvents(spark, sfDir)
    val keys = deduped.select("user_id", "event_type", "value").distinct().count()
    assert(deduped.count() == keys)
  }
}
