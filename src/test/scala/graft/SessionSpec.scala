package graft

/** Pins the reference's fault-tolerance envelope as Spark config
  * (SURVEY.md §5's promised smoke test).
  *
  * The reference hand-builds its envelope in
  * `/root/reference/distributed/task.go:11-14`: 10 s task timeout with
  * maxAttempts = 3, and speculative re-execution when a task runs longer
  * than 1.5× the mean of completed tasks. In the Spark engine that whole
  * layer is configuration; this spec asserts the session factory actually
  * sets it, so the envelope is a tested contract rather than a paper claim.
  */
object SessionSpec {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}

class SessionSpec extends SparkSpec {

  test("session pins the reference's speculation policy (task.go:13-14)") {
    assert(spark.conf.get("spark.speculation") == "true")
    assert(spark.conf.get("spark.speculation.multiplier").toDouble == 1.5)
    assert(spark.conf.get("spark.speculation.quantile").toDouble > 0.0)
  }

  test("session pins retry budget >= reference maxAttempts (task.go:11-12)") {
    assert(spark.conf.get("spark.task.maxFailures").toInt >= 3)
    // plain local[N] masters IGNORE spark.task.maxFailures (hardcoded 1
    // in SparkContext.createTaskScheduler); the factory must rewrite to
    // the local[N,F] form so retries are genuinely in force locally
    assert(spark.sparkContext.master.matches("local\\[[0-9*]+,[0-9]+\\]"),
      spark.sparkContext.master)
    assert(GraftSession.withLocalRetries("local[32]") == "local[32,3]")
    assert(GraftSession.withLocalRetries("local[*]") == "local[*,3]")
    assert(GraftSession.withLocalRetries("yarn") == "yarn")
    assert(GraftSession.withLocalRetries("local[4,2]") == "local[4,2]")
  }

  test("a failing task is actually retried up to the budget in local runs") {
    // proves the envelope is live, not just conf strings: a task that
    // fails twice then succeeds must complete under maxFailures=3.
    // (JVM-static counter: local-mode executors share the test JVM.)
    SessionSpec.attempts.set(0)
    val out = spark.sparkContext.parallelize(Seq(1), 1).map { x =>
      if (SessionSpec.attempts.incrementAndGet() < 3)
        throw new RuntimeException("planted failure")
      x * 10
    }.collect()
    assert(out.toSeq == Seq(10))
    assert(SessionSpec.attempts.get() == 3)
  }

  test("session sets semantic confs once at build; loaders are side-effect free") {
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    // events loads without the loader touching session conf
    val before = spark.conf.getAll.filter(_._1.startsWith("spark.sql.legacy"))
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val after = spark.conf.getAll.filter(_._1.startsWith("spark.sql.legacy"))
    assert(before == after)
  }
}
