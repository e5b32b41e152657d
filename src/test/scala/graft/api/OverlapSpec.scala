package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Focused tests for the r18 lifecycle-overlap helper. */
class OverlapSpec extends AnyFunSuite {
  // the Spark-touching test below uses the JVM-shared test session —
  // never a private one (stopping it would kill every other suite)

  test("all returns results in submission order") {
    val out = Overlap.all(Seq(
      () => { Thread.sleep(50); "slow" },
      () => "fast",
      () => { Thread.sleep(20); "mid" }))
    assert(out === Seq("slow", "fast", "mid"))
  }

  test("run lets every sibling settle before rethrowing the first failure") {
    val finished = new java.util.concurrent.atomic.AtomicInteger(0)
    val boom = intercept[IllegalStateException] {
      Overlap.run(
        () => { Thread.sleep(10); throw new IllegalStateException("first") },
        () => { Thread.sleep(120); finished.incrementAndGet(); () },
        () => { finished.incrementAndGet(); () })
    }
    assert(boom.getMessage === "first")
    // the idempotent-overwrite contract: siblings were NOT cancelled
    assert(finished.get === 2)
  }

  test("failure in a later task rethrows that task's cause") {
    val boom = intercept[RuntimeException] {
      Overlap.all(Seq(
        () => 1,
        () => throw new RuntimeException("second task")))
    }
    assert(boom.getMessage === "second task")
  }

  test("single task runs inline (no pool)") {
    val t = Thread.currentThread().getId
    var ran: Long = -1L
    Overlap.run(() => { ran = Thread.currentThread().getId })
    assert(ran === t)
  }

  test("prime materializes a persisted frame once for overlapped readers") {
    val spark = graft.SparkSpec.session
    val df = spark.range(1000).selectExpr("id", "id * 2 as v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Overlap.prime(df)
      // cache is fully materialized: both overlapped readers see it
      val sums = Overlap.all(Seq(
        () => df.selectExpr("sum(v)").head().getLong(0),
        () => df.selectExpr("count(1)").head().getLong(0)))
      assert(sums === Seq(999000L, 1000L))
    } finally df.unpersist(blocking = true)
  }
}
