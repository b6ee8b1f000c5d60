package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Final top-k result: ids/scores sorted by (score DESC, id ASC),
  * exactly k (or fewer) elements. Product type so Spark can encode it
  * without Kryo. */
case class TopK(ids: Array[Long], scores: Array[Double]) {
  def toPairs: Seq[(Long, Double)] = ids.zip(scores).toSeq
}

/** Mutable bounded top-k buffer: arrays of capacity `ids.length >= n`
  * whose first `n` slots are valid and kept sorted by
  * (score DESC, id ASC). `reduce` mutates the arrays IN PLACE (the
  * Aggregator contract explicitly permits modifying and returning the
  * buffer): the original immutable-buffer formulation allocated two
  * fresh arrays per ACCEPTED row, which at large k is the entire
  * aggregate cost — the nominate-all PQ evidence query (k ≈ |items|)
  * spent its ~6 s almost entirely in that alloc+copy churn. In-place
  * insertion is two `System.arraycopy` memmoves; allocation happens only
  * on capacity growth (geometric, capped at k — so partial buffers
  * serialize at ~n, not k, and a sparse group never ships k empty
  * slots through the shuffle). */
case class TopKBuf(n: Int, ids: Array[Long], scores: Array[Double]) {
  def toPairs: Seq[(Long, Double)] = (0 until n).map(i => (ids(i), scores(i)))
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
class TopKAggregator(k: Int) extends Aggregator[(Long, Double), TopKBuf, TopK] {

  private def better(i1: Long, s1: Double, i2: Long, s2: Double): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopKBuf = TopKBuf(0, Array.empty, Array.empty)

  override def reduce(b0: TopKBuf, a: (Long, Double)): TopKBuf = {
    val n = b0.n
    // NaN never enters the heap: better() is false for every comparison
    // involving NaN, so one admitted NaN row would freeze the insertion
    // scan at its slot and silently unsort the buffer. Call sites also
    // route NULL scores here as NaN (coalesce) — the typed encoder's
    // primitive Double field would otherwise kill the job on the first
    // null-scored row.
    if (a._2.isNaN) b0
    // steady-state fast path: a full buffer rejects a non-improving row
    // with ONE comparison against the current minimum
    else if (n == k && !better(a._1, a._2, b0.ids(n - 1), b0.scores(n - 1))) b0
    else {
      var pos = n
      while (pos > 0 && better(a._1, a._2, b0.ids(pos - 1), b0.scores(pos - 1))) pos -= 1
      if (pos >= k) b0
      else {
        // grow capacity geometrically (never past k) when the valid
        // prefix fills it; otherwise insert into the existing arrays
        val b =
          if (n == b0.ids.length && n < k) {
            val cap = math.min(k, math.max(4, n * 2))
            TopKBuf(n, java.util.Arrays.copyOf(b0.ids, cap),
              java.util.Arrays.copyOf(b0.scores, cap))
          } else b0
        // shift the surviving right tail by one (the k-th element, if
        // any, falls off) and write in place — memmove, no allocation
        val keep = math.min(n, k - 1)
        System.arraycopy(b.ids, pos, b.ids, pos + 1, keep - pos)
        System.arraycopy(b.scores, pos, b.scores, pos + 1, keep - pos)
        b.ids(pos) = a._1; b.scores(pos) = a._2
        if (n < k) b.copy(n = n + 1) else b
      }
    }
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    if (b2.n == 0) b1
    else if (b1.n == 0) b2
    else {
      // merge two sorted runs into a fresh exact-size buffer (merges
      // happen once per shuffled partial, never per row; a later reduce
      // against the merged buffer re-grows through the normal path)
      val m = math.min(b1.n + b2.n, k)
      val ids = new Array[Long](m); val scores = new Array[Double](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeLeft = j >= b2.n ||
          (i < b1.n && better(b1.ids(i), b1.scores(i), b2.ids(j), b2.scores(j)))
        if (takeLeft) { ids(o) = b1.ids(i); scores(o) = b1.scores(i); i += 1 }
        else { ids(o) = b2.ids(j); scores(o) = b2.scores(j); j += 1 }
        o += 1
      }
      TopKBuf(m, ids, scores)
    }

  override def finish(r: TopKBuf): TopK =
    TopK(java.util.Arrays.copyOf(r.ids, r.n), java.util.Arrays.copyOf(r.scores, r.n))
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
}
