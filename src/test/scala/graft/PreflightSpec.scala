package graft

/** Declared-vs-executable preflight (round-5 lesson): the driver's Verify
  * silently drops queries that throw, so a loader regression can erase a
  * dozen queries from the correctness artifact while `sbt test` stays
  * green. This suite executes EVERY declared `SparkEntry.queries` entry
  * end-to-end at sf0.001 (noop sink — full evaluation, nothing pruned)
  * and goes red if any declared query cannot run.
  *
  * One test per query so a failure names the query directly in the test
  * report instead of aborting a single mega-test at the first breakage.
  */
class PreflightSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"declared query executes: $name") {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
  }

  test("every oracleSql key has a queries entry (and column names can match)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: ${orphans.toSeq.sorted}")
  }
}
