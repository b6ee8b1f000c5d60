package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class SequenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("TrainingSequences emits ordered fixed-length contexts per entity") {
    val events = Seq(
      (1L, ts(10), 100L, "a"),
      (1L, ts(20), 101L, "b"),
      (1L, ts(30), 102L, "c"),
      (1L, ts(40), 103L, "d"),
      (1L, ts(50), 104L, "e"),
      (2L, ts(10), 200L, "x"),   // only 2 events → no full context
      (2L, ts(20), 201L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TrainingSequences(contextLen = 3).transform(events)
      .orderBy("label_event_id").collect()
    assert(out.length == 2) // user 1 positions 4 and 5 only
    assert(out(0).getAs[Long]("label_event_id") == 103L)
    assert(out(0).getSeq[String](out(0).fieldIndex("context")) == Seq("a", "b", "c"))
    assert(out(0).getAs[String]("context_str") == "a|b|c")
    assert(out(0).getAs[String]("label") == "d")
    assert(out(1).getAs[String]("context_str") == "b|c|d")
    assert(out(1).getAs[String]("label") == "e")
  }

  test("DocumentChunks windows overlap by the configured stride; short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens, chunk 4/overlap 2
      (2L, "a b c"),                                   // under chunkSize → one chunk
      (3L, "solo"))
      .toDF("doc_id", "text")
    val out = DocumentChunks(chunkSize = 4, overlap = 2).transform(docs)
      .orderBy("doc_id", "chunk_id").collect()
    val doc1 = out.filter(_.getLong(0) == 1L).map(r =>
      (r.getInt(1), r.getInt(2), r.getString(3)))
    // stride 2: windows start at tokens 1,3,5,7 — the 7-start window
    // reaches the end, so no pure-suffix 9-start window is emitted
    assert(doc1.toSeq == Seq(
      (0, 4, "w1 w2 w3 w4"), (1, 4, "w3 w4 w5 w6"),
      (2, 4, "w5 w6 w7 w8"), (3, 4, "w7 w8 w9 w10")))
    assert(out.filter(_.getLong(0) == 2L).map(r => (r.getInt(2), r.getString(3))).toSeq ==
      Seq((3, "a b c")))
    assert(out.filter(_.getLong(0) == 3L).length == 1)
  }

  test("DocumentChunks yields zero chunks for NULL text") {
    val docs = Seq((1L, Option("one two three")), (2L, None))
      .toDF("doc_id", "text")
    val out = DocumentChunks(chunkSize = 8, overlap = 2).transform(docs).collect()
    assert(out.length == 1, "a NULL text must emit no chunk rows")
    assert(out.head.getLong(0) == 1L)
  }

  test("ResampleLocf fills daily gaps forward from each entity's first day") {
    def dayTs(d: Int, h: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val events = Seq(
      // user 1: two events day 1 (later one wins), one event day 3
      (1L, dayTs(1, 1), 100L, 10.0),
      (1L, dayTs(1, 2), 101L, 20.0),
      (1L, dayTs(3), 102L, 5.0),
      // user 2: single event day 4 (sets the corpus max day)
      (2L, dayTs(4), 200L, 7.5))
      .toDF("user_id", "ts", "event_id", "value")
    val out = ResampleLocf().transform(events)
      .orderBy("user_id", "day")
      .select("user_id", "day", "value_cents", "is_observed")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getInt(3))).toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 2000L, 1),  // day-1 last observation (20.0)
      (1L, "2024-01-02", 2000L, 0),  // gap: carried forward
      (1L, "2024-01-03", 500L, 1),
      (1L, "2024-01-04", 500L, 0),   // grid extends to the corpus max day
      (2L, "2024-01-04", 750L, 1)))
  }

  test("ResampleLocf breaks same-day ties by the tie column") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 2L, 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 3L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = ResampleLocf().transform(events).collect()
    assert(out.length == 1 && out(0).getAs[Long]("value_cents") == 200L,
      "equal timestamps: the higher event_id is the last observation")
  }

  test("TrainingSequences breaks timestamp ties deterministically by tie column") {
    val events = Seq(
      (1L, ts(10), 1L, "a"),
      (1L, ts(10), 2L, "b"),  // same ts — event_id orders them
      (1L, ts(10), 3L, "c"),
      (1L, ts(20), 4L, "d"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TrainingSequences(contextLen = 3).transform(events).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("context_str") == "a|b|c")
    assert(out(0).getAs[String]("label") == "d")
  }
}
