package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k buffer: ids/scores kept sorted by (score DESC, id ASC),
  * truncated to k. Product type so Spark can encode it without Kryo. */
case class TopK(ids: Array[Long], scores: Array[Double]) {
  def toPairs: Seq[(Long, Double)] = ids.zip(scores).toSeq
}

/** Bounded-heap top-k aggregate (SURVEY.md §7.3 — "the one genuinely
  * custom piece"). Replaces `Window.orderBy(score).row_number <= k` for
  * per-group top-k at scale: each partition keeps only k candidates
  * (partial aggregation / map-side combine), so no group ever materializes
  * or sorts its full candidate set — the global sort a window would need
  * is the thing that dies at 100 TB.
  *
  * Deterministic total order: score DESC, then id ASC on ties.
  */
class TopKAggregator(k: Int) extends Aggregator[(Long, Double), TopK, TopK] {

  private def better(i1: Long, s1: Double, i2: Long, s2: Double): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopK = TopK(Array.empty, Array.empty)

  override def reduce(b: TopK, a: (Long, Double)): TopK = {
    val n = b.ids.length
    if (n == k && !better(a._1, a._2, b.ids(n - 1), b.scores(n - 1))) b
    else {
      // insertion into a ≤k sorted array — O(k) per element
      var pos = n
      while (pos > 0 && better(a._1, a._2, b.ids(pos - 1), b.scores(pos - 1))) pos -= 1
      val m = math.min(n + 1, k)
      val ids = new Array[Long](m); val scores = new Array[Double](m)
      var i = 0
      while (i < m) {
        if (i < pos) { ids(i) = b.ids(i); scores(i) = b.scores(i) }
        else if (i == pos) { ids(i) = a._1; scores(i) = a._2 }
        else { ids(i) = b.ids(i - 1); scores(i) = b.scores(i - 1) }
        i += 1
      }
      TopK(ids, scores)
    }
  }

  override def merge(b1: TopK, b2: TopK): TopK = {
    // merge two sorted runs, truncate at k
    val m = math.min(b1.ids.length + b2.ids.length, k)
    val ids = new Array[Long](m); val scores = new Array[Double](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeLeft = j >= b2.ids.length ||
        (i < b1.ids.length && better(b1.ids(i), b1.scores(i), b2.ids(j), b2.scores(j)))
      if (takeLeft) { ids(o) = b1.ids(i); scores(o) = b1.scores(i); i += 1 }
      else { ids(o) = b2.ids(j); scores(o) = b2.scores(j); j += 1 }
      o += 1
    }
    TopK(ids, scores)
  }

  override def finish(r: TopK): TopK = r
  override def bufferEncoder: Encoder[TopK] = Encoders.product[TopK]
  override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
}
