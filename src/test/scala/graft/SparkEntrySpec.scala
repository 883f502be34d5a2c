package graft

/** Driver-contract invariants: the flagship entry works, every oracle key
  * has a query, and every query runs against the smallest fixture.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("oracle coverage: at least 80% of queries are oracle-checked") {
    val covered = SparkEntry.queries.keySet.count(SparkEntry.oracleSql.contains)
    assert(covered * 5 >= SparkEntry.queries.size * 4,
      s"$covered of ${SparkEntry.queries.size} oracle-checked")
  }

  test("every registered query executes and yields a non-empty schema at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        if (df.schema.isEmpty) Some(s"$name: empty schema") else None
      } catch { case e: Exception => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
