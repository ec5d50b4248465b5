package graft

/** Registry-wide guardrails: every declared query must (a) execute and
  * return rows at sf0.001 (protects the driver's rows-only checks) and
  * (b) avoid unbounded cross products — nested-loop joins are allowed
  * only where the query intentionally bounds its domain. */
class AllQueriesSpec extends SparkSpec {

  // intentionally-bounded non-equi joins: explicit domain limits
  // (dd_ngram_jaccard: doc_id < 50; ann_brute_topk: numQueries probe
  // rows). ann_ivf_topk left the list in round 2: centroid assignment
  // is now a map-side kernel, so its joins are all equi-joins.
  private val nestedLoopAllowed =
    Set("dd_ngram_jaccard", "ann_brute_topk")

  test("every registered query returns rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("no unbounded nested-loop joins in declared query plans") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!nestedLoopAllowed(name)) {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"), s"$name has a cartesian product")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name has an unbounded nested-loop join")
      }
    }
  }

  test("no query windows over a single partition (global-window scale-killer)") {
    // a WindowExec with an empty partitionSpec requires AllTuples — the
    // whole dataset on one task. Every window in the registry must key
    // on something. (Global aggregates and runtime bloom-filter builds
    // legitimately use SinglePartition exchanges of one-row partials —
    // those are fine and not flagged here.)
    SparkEntry.queries.foreach { case (name, fn) =>
      val offenders = fn(spark, sfDir).queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
      }
      assert(offenders.isEmpty, s"$name has a global (unpartitioned) window")
    }
  }

  test("every oracleSql key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
