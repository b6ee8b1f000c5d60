package graft.ops

import graft.SparkSpec

class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gain tables: g(1) = 1e9 exactly, strictly decreasing, prefix sums") {
    val g = EvalRanking.gainNanos(10)
    assert(g.head == 1000000000L, "log2(2) = 1 exactly")
    assert(g(2) == 500000000L, "log2(4) = 2 exactly")
    assert(g.sliding(2).forall(s => s(0) > s(1)), "discount must decrease")
    assert(EvalRanking.idcgNanos(10) == g.scanLeft(0L)(_ + _).tail)
  }

  test("EvalRanking: hand-computed MRR/recall/NDCG per query") {
    val ranked = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3),
      (2L, "a", 1), (2L, "b", 2),
      (3L, "a", 1), (3L, "b", 2)
    ).toDF("query_id", "item_id", "rank")
    val relevant = Seq(
      (1L, "b"), (1L, "c"), (1L, "z"), // 2 of 3 retrieved, first at rank 2
      (3L, "a")                        // perfect single hit
    ).toDF("query_id", "item_id")
    val op = EvalRanking(relevant, k = 3)
    val out = op.transform(ranked).collect()
      .map(r => r.getLong(0) -> r).toMap
    val g = op.gainNanos; val idcg = op.idcgNanos

    val q1 = out(1L)
    assert(q1.getLong(1) == 3 && q1.getLong(2) == 2)
    assert(q1.getLong(3) == 2 * 10000 / 3)          // recall 6666 bp
    assert(q1.getLong(4) == 1000000 / 2)            // first hit at rank 2
    assert(q1.getLong(5) == (g(1) + g(2)) * 10000 / idcg(2))

    val q2 = out(2L)                                 // no relevant items
    assert(q2.getLong(1) == 0 && q2.getLong(2) == 0)
    assert(q2.isNullAt(3) && q2.getLong(4) == 0 && q2.isNullAt(5),
      "undefined metrics are NULL, not zero")

    val q3 = out(3L)                                 // perfect retrieval
    assert(q3.getLong(3) == 10000 && q3.getLong(4) == 1000000 &&
      q3.getLong(5) == 10000)
  }

  test("EvalRanking: candidates beyond k are ignored") {
    val ranked = Seq((1L, "x", 1), (1L, "hit", 5)).toDF("query_id", "item_id", "rank")
    val rel = Seq((1L, "hit")).toDF("query_id", "item_id")
    val out = EvalRanking(rel, k = 3).transform(ranked).head()
    assert(out.getLong(2) == 0 && out.getLong(4) == 0,
      "a hit at rank 5 is outside k=3")
  }

  test("EvalRanking: an item repeated within top-k counts one hit at its best rank") {
    // same item at ranks 1 and 3 — recall must stay <= 10000 and DCG must
    // bill the item once, at rank 1
    val ranked = Seq((1L, "a", 1), (1L, "a", 3), (1L, "b", 2))
      .toDF("query_id", "item_id", "rank")
    val rel = Seq((1L, "a")).toDF("query_id", "item_id")
    val op = EvalRanking(rel, k = 3)
    val out = op.transform(ranked).head()
    assert(out.getLong(2) == 1, "one hit, not two")
    assert(out.getLong(3) == 10000, "recall capped at 10000 bp")
    assert(out.getLong(5) == op.gainNanos(0) * 10000 / op.idcgNanos(0),
      "DCG uses the best rank only")
  }

  test("EvalRanking: output carries no presentation ordering exchange") {
    // the op must not end in a global sort — ordering is the query layer's
    val ranked = Seq((2L, "a", 1), (1L, "a", 1)).toDF("query_id", "item_id", "rank")
    val rel = Seq((1L, "a")).toDF("query_id", "item_id")
    val plan = EvalRanking(rel, k = 3).transform(ranked)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"op output should not be range-sorted:\n$plan")
  }
}
