package graft

import org.scalatest.funsuite.AnyFunSuite

/** The harness wall-clock guard: a failing or wedged query must degrade to a
  * Left carrying WHY (which `Verify` persists as `<out>/<name>.err`), never a
  * silent absence — round 8's 26 missing correctness rows had to be
  * re-diagnosed from scratch because failures left no trace.
  */
class BoundedRunSuite extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]")
    .appName("graft-bounded-run")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("success returns Right with the body's value") {
    assert(BoundedRun.attempt(spark, "ok", 30)(41 + 1) === Right(42))
  }

  test("a throwing body returns Left carrying the exception class and message") {
    val r = BoundedRun.attempt(spark, "boom", 30) {
      throw new IllegalStateException("deliberate-failure-marker")
    }
    assert(r.isLeft)
    val msg = r.left.toOption.get
    assert(msg.contains("IllegalStateException"))
    assert(msg.contains("deliberate-failure-marker"))
  }

  test("a wedged body returns Left(TIMEOUT ...) and the loop moves on") {
    val latch = new java.util.concurrent.CountDownLatch(1)
    val r = BoundedRun.attempt(spark, "wedge", 1) {
      latch.await() // wedged forever; the daemon thread is abandoned
      "unreachable"
    }
    assert(r.isLeft)
    assert(r.left.toOption.get.startsWith("TIMEOUT"))
    // the guard must not poison the session for the NEXT query
    assert(BoundedRun.attempt(spark, "after", 30)("fine") === Right("fine"))
    latch.countDown() // release the abandoned thread before JVM teardown
  }
}
