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
