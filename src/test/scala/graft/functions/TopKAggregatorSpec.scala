package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TopKAggregatorSpec extends AnyFunSuite {

  private def bruteTopK(xs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    xs.sortBy { case (id, s) => (-s, id) }.take(k)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("reduce-only path matches brute-force sort for any input") {
    check(Prop.forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(-10.0, 10.0)))) {
      xs: List[(Long, Double)] =>
        val agg = new TopKAggregator(5)
        val got = xs.foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
        got.toPairs == bruteTopK(xs, 5)
    })
  }

  test("merge of split halves equals aggregate of whole") {
    check(Prop.forAll(
      Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(-5.0, 5.0))),
      Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(-5.0, 5.0)))) {
      (l: List[(Long, Double)], r: List[(Long, Double)]) =>
        val agg = new TopKAggregator(7)
        val bl = l.foldLeft(agg.zero)(agg.reduce)
        val br = r.foldLeft(agg.zero)(agg.reduce)
        agg.merge(bl, br).toPairs == bruteTopK(l ++ r, 7)
    })
  }

  test("ties broken by id ascending") {
    val agg = new TopKAggregator(3)
    val xs = Seq((5L, 1.0), (2L, 1.0), (9L, 1.0), (1L, 0.5))
    val got = xs.foldLeft(agg.zero)(agg.reduce).toPairs
    assert(got == Seq((2L, 1.0), (5L, 1.0), (9L, 1.0)))
  }

  test("NaN scores never enter the heap (one NaN row would unsort the buffer)") {
    val agg = new TopKAggregator(3)
    var b = agg.zero
    b = agg.reduce(b, (1L, 5.0))
    b = agg.reduce(b, (2L, Double.NaN))
    b = agg.reduce(b, (3L, 9.0))
    b = agg.reduce(b, (4L, 7.0))
    b = agg.reduce(b, (5L, 8.0))
    val out = agg.finish(agg.merge(agg.zero, b))
    assert(out.ids.toSeq == Seq(3L, 5L, 4L) &&
      out.scores.toSeq == Seq(9.0, 8.0, 7.0),
      s"NaN skipped, order intact: ${out.ids.toSeq} / ${out.scores.toSeq}")
  }
}
