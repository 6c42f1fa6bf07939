package graft

/** Driver-contract smoke: `entry(spark)` must return rows > 0 at sf0.001. */
class EntrySmokeSpec extends SparkSpec {
  test("entry returns a non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
