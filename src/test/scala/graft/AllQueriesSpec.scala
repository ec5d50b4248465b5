package graft

/** Registry-wide guardrails: every declared query must (a) execute and
  * return rows at sf0.001 (protects the driver's rows-only checks) and
  * (b) avoid unbounded cross products — nested-loop joins are allowed
  * only where the query intentionally bounds its domain. */
class AllQueriesSpec extends SparkSpec {

  // intentionally-bounded non-equi joins: explicit domain limits
  // (dd_ngram_jaccard: doc_id < 50; ann_brute_topk and its quantized
  // twins ann_sq8_topk / ann_pq_topk: the broadcast build side is
  // exactly numQueries probe rows — brute-force scans by design, the
  // exact baselines their bucketed variants are gated against).
  // ann_ivf_topk left the list in round 2: centroid assignment is now
  // a map-side kernel, so its joins are all equi-joins; ann_ivf_pq
  // equi-joins on cid for the same reason.
  // tx_rrf's dense arm broadcasts the bounded probe set (3 rows)
  // against the embeddings scan — the ann_brute_topk shape.
  private val nestedLoopAllowed =
    Set("dd_ngram_jaccard",
      // the Jaccard verifier's containment twin: identical doc_id < 50
      // bounded non-equi self-join
      "dd_containment",
      "ann_brute_topk", "ann_sq8_topk", "ann_pq_topk",
      "ann_mrl_topk", "mm_embed_ann", "tx_rrf",
      // same bounded shape as ann_brute_topk: the BNLJ build side is
      // exactly numQueries (10) broadcast probe rows
      "ann_filtered_topk",
      // stage-1 of the MRL funnel: prefix-dim scan against the
      // 3-row broadcast probe set (the ann_mrl_topk shape)
      "tx_rrf_ann",
      // |sources|² pair join of |sources|-row signature frames (the
      // dd_source_overlap bound, here as an explicit non-equi join)
      "dd_source_overlap_mh",
      // |types| × |days| spine cross join — both sides bounded by the
      // date range and the type domain, never the event stream
      "ev_gapfill",
      // the global-totals attach: a GLOBAL (one-row-by-construction)
      // aggregate of the ≤nLists-row count rollup cross-joined back
      // onto it
      "ann_ivf_incr")

  // One build per query, shared by every test in this suite: building a
  // registry DataFrame is EAGER for several entries (the five
  // ev_stream_* queries run a real stream to a memory sink; the dd
  // cluster queries run their iterative jobs), so per-test rebuilds
  // multiplied ~10 s of streaming execution by the number of
  // plan-inspection tests.
  private lazy val frames: Seq[(String, org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) => n -> fn(spark, sfDir) }

  test("building the registry leaves the session conf untouched") {
    // several builders scope conf around their build (q24's runtime
    // filter thresholds, streaming state partitions + provider,
    // iterative-loop shuffle sizing) — every one must restore EXPLICIT
    // settings exactly, or query results become build-order dependent.
    // Checked per-key (set, unset, and value drift all fail). MUST be
    // the first test in this suite: the snapshot has to precede the
    // shared lazy build, or the check is vacuous.
    val before = spark.conf.getAll
    frames.length // force every builder
    val after = spark.conf.getAll
    val drifted = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k))
    assert(drifted.isEmpty,
      drifted.map(k => s"$k: ${before.get(k)} -> ${after.get(k)}").mkString("; "))
  }

  test("every registered query returns rows at sf0.001") {
    val empty = frames.collect { case (name, df) if df.count() == 0 => name }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("no unbounded nested-loop joins in declared query plans") {
    frames.foreach { case (name, df) =>
      if (!nestedLoopAllowed(name)) {
        val p = df.queryExecution.executedPlan.toString
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
    // those are fine and not flagged here.) flattenPlan, not .collect:
    // AQE's wrapper is a LeafExecNode, so a plain collect inspects
    // nothing inside any plan with an exchange.
    frames.foreach { case (name, df) =>
      val offenders = flattenPlan(df.queryExecution.executedPlan).filter {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.isEmpty
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
          w.partitionSpec.isEmpty
        case _ => false
      }
      assert(offenders.isEmpty, s"$name has a global (unpartitioned) window")
    }
  }

  // Window-partition keys allowed WITHOUT a WindowGroupLimit rank
  // prune. The banned class (r9 dd_spans, r10 tx_tfidf/tx_bm25): a
  // WindowExec partitioned on an unbounded-cardinality corpus-derived
  // key (term/gram/digest/shingle) puts a Zipfian hot key's whole
  // partition — O(|docs|) rows for a stop word or license header —
  // into ONE task that sorts and buffers it all; AQE skew-split
  // divides sort-merge JOIN partitions, not window partitions, so the
  // fix is always groupBy partial-agg + ReusedExchange re-attach, or a
  // rank prune when only a top-k survives. Every entry here is a key
  // whose PER-PARTITION row count stays bounded as the corpus grows:
  private val windowKeysAllowed: Set[Set[String]] = Set(
    // per-document rows (span island merges, excision splice): bounded
    // by the document's own token count, never by corpus size
    Set("doc_id"),
    // per-user event history (sessionization, as-of, retention, SCD2):
    // bounded by one user's activity, the natural unit of event work
    Set("user_id"),
    // (the former Set("label") entry — cluster-size count window —
    // is GONE: clusterFrame now computes sizes as a groupBy partial
    // aggregation re-attached by join, and survivorsFor picks its
    // winner with a struct-max aggregation, so no window partitions
    // on a cluster label anywhere in the registry and the list's
    // weakest boundedness argument is deleted rather than defended)
    // transition-matrix rank: input frame is the aggregated
    // (from_type, to_type) count matrix — |types|^2 rows total
    Set("from_type"),
    // hourly volume moments per type: input is the (type, hour)
    // aggregate, |types| x |hours| rows, never raw events
    Set("event_type"),
    // declared-vs-detected language confusion audit: input is the
    // (labeled, detected) confusion matrix — |langs|^2 rows total
    Set("labeled_lang"),
    // explicit parallelism shards (sequence packing, curriculum,
    // pipeline shard windows): per-shard size = corpus/shards with
    // shards scaling with the cluster — the documented deliberate cap
    Set("shard"), Set("phase", "shard"),
    // per-entity TPC-H windows: rows per customer / supplier grow
    // with that entity's activity, while the entity domains
    // themselves scale out with the data (TPC-H SF semantics)
    Set("o_custkey"), Set("l_suppkey"),
    // politeness scheduling (pipe_fetch_schedule): rows per host grow
    // with that host's crawl activity while the host domain scales
    // out with the corpus (the o_custkey argument) — and the per-host
    // sequence is the SEMANTICS, not a plan choice: a host's fetch
    // queue is serialized by crawl-delay by definition, so the
    // window's per-host cost mirrors the real-world constraint it
    // schedules; a production frontier shards hot hosts by time
    // bucket ON TOP of this ordering (SCALING.md) — and since r19
    // that frontier EXISTS as pipe_fetch_schedule_sharded, gated
    // row-identical to this form
    Set("host"),
    // the sharded frontier's local-rank window: per-partition rows
    // ≤ bucketWidth BY CONSTRUCTION (the bucket is an id-range
    // slice), the strongest boundedness argument on this list; its
    // offset window runs over the aggregated (host, bucket) COUNT
    // frame (the from_type precedent) and is covered by Set("host")
    Set("host", "bucket"))

  /** Key sets of WindowExec nodes in `df`'s plan that are neither
    * allowlisted as bounded nor pruned by a same-keyed
    * WindowGroupLimit in their OWN subtree. Subtree scoping + exprId
    * matching matter: a rank prune elsewhere in the plan (or on a
    * different attribute that happens to share a name) must not
    * exempt an unpruned count-window on the same key — that is
    * exactly the banned shape co-occurring with a legitimate one. */
  private def skewWindowOffenders(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] = {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.{ProjectExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // the prune must belong to THIS window: a rank-pruned WindowExec
    // plans as Window → WGL(Final) → Sort → Exchange → WGL(Partial),
    // so walk the child chain through plumbing nodes only — stopping
    // at anything else prevents a sibling/stacked window's prune (or
    // one elsewhere in the plan) from exempting an unpruned count
    // window on the same key, which is exactly the banned shape
    // co-occurring with a legitimate one
    @annotation.tailrec
    def ownPrune(p: SparkPlan, ids: Set[org.apache.spark.sql.catalyst.expressions.ExprId]): Boolean =
      p match {
        case g: WindowGroupLimitExec =>
          g.partitionSpec.flatMap(_.references.map(_.exprId)).toSet == ids
        case s: SortExec            => ownPrune(s.child, ids)
        case pr: ProjectExec        => ownPrune(pr.child, ids)
        case a: AQEShuffleReadExec  => ownPrune(a.child, ids)
        case q: QueryStageExec      => ownPrune(q.plan, ids)
        case e: ShuffleExchangeLike => ownPrune(e.child, ids)
        case _                      => false
      }
    flattenPlan(df.queryExecution.executedPlan).collect { case w: WindowExec =>
      val names = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      val ids = w.partitionSpec.flatMap(_.references.map(_.exprId)).toSet
      (names, ownPrune(w.child, ids))
    }.collect { case (names, pruned)
        if !windowKeysAllowed.contains(names) && !pruned => names }
  }

  test("no WindowExec on an unbounded-cardinality key without a rank prune") {
    frames.foreach { case (name, df) =>
      val bad = skewWindowOffenders(df)
      assert(bad.isEmpty,
        s"$name has a WindowExec partitioned on ${bad.map(_.mkString(",")).mkString("; ")} " +
          "with no WindowGroupLimit prune — if a hot key's partition is corpus-sized " +
          "this is an unsplittable straggler; use groupBy partial-agg + " +
          "ReusedExchange re-attach (dd_spans/tfidf shape) or allowlist the " +
          "key here with a boundedness argument")
    }
  }

  test("the window-skew guard fires on the banned shape (negative control)") {
    // the exact r9 tx_tfidf formulation the guard exists to ban:
    // document frequency as a count over a term-partitioned window
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val reverted = Tables.documents(spark, sfDir)
      .select($"doc_id", explode_outer(split(lower($"text"), "\\s+")).as("term"))
      .filter($"term".isNotNull && $"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"term")))
    assert(skewWindowOffenders(reverted) == Seq(Set("term")),
      "guard must flag a term-partitioned unpruned window")
    // co-occurrence hole (r11 self-review): a legitimate rank prune on
    // the SAME key elsewhere in the plan must NOT exempt the unpruned
    // count window — the prune has to sit in the count window's own
    // child chain, which here it does not (the windows stack)
    val mixed = reverted
      .withColumn("rk", row_number().over(
        Window.partitionBy($"term").orderBy($"c".desc, $"doc_id")))
      .filter($"rk" <= 3)
    assert(skewWindowOffenders(mixed).contains(Set("term")),
      "a same-keyed rank prune elsewhere must not exempt the count window")
  }

  test("no Filter evaluates the same graft kernel twice (InferFiltersFromGenerate tax)") {
    // inner explode over a kernel-built array makes Catalyst infer
    // `size(kernel(x)) > 0 AND isnotnull(kernel(x))` guards and push
    // them into the Filter — re-running the kernel 2× per row on top
    // of the Project's own eval (3 tokenizations/row in r7's
    // contamination and bm25 plans). The fix is explode_outer + a null
    // check on the GENERATED attribute; this guard catches the pattern
    // registry-wide by flagging any Filter condition that contains the
    // same graft_* call more than once.
    frames.foreach { case (name, df) =>
      flattenPlan(df.queryExecution.executedPlan).foreach {
        case f: org.apache.spark.sql.execution.FilterExec =>
          val calls = "graft_[a-z0-9_]+".r.findAllIn(f.condition.toString).toSeq
          val dup = calls.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
          assert(dup.isEmpty,
            s"$name re-evaluates ${dup.mkString(",")} inside a Filter: ${f.condition}")
        case _ =>
      }
    }
  }

  test("broadcast hints only on dimension or literally-bounded sides (registry-wide)") {
    // The round-2 scale-killer pattern: an explicit broadcast() hint on
    // a side whose cardinality scales with a fact table (q17's old
    // broadcast(avgQty) — one row per distinct l_partkey) forces an OOM
    // at 100 TB where an unhinted plan lets AQE broadcast only when the
    // side is actually small. Guard: a BROADCAST hint that survives
    // optimization may sit only over (a) dimension tables, or (b) a
    // fact-table subtree bounded by a literal range filter or limit
    // (the ANN queries' `vec_id < numQueries` probe sides).
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.plans.logical._
    val factTables = Seq("lineitem", "orders", "events", "documents", "embeddings")
    def isFact(r: org.apache.spark.sql.execution.datasources.LogicalRelation): Boolean =
      r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          factTables.exists(t =>
            fs.location.rootPaths.exists(_.toString.contains(s"/$t.parquet")))
        case _ => false
      }
    // Only a literal range bound on a ROW-ID column (vec_id < 10,
    // doc_id < 50, either comparison orientation) or a limit caps a
    // side's cardinality. A predicate on any other column — equality
    // (returnflag = 'R') or range (quantity < 24) — selects a FIXED
    // FRACTION that still scales linearly with the fact table.
    def isIdRangeBound(e: Expression): Boolean = e match {
      case LessThan(a: AttributeReference, _: Literal)           => a.name.endsWith("_id")
      case LessThanOrEqual(a: AttributeReference, _: Literal)    => a.name.endsWith("_id")
      case GreaterThan(_: Literal, a: AttributeReference)        => a.name.endsWith("_id")
      case GreaterThanOrEqual(_: Literal, a: AttributeReference) => a.name.endsWith("_id")
      case _                                                     => false
    }
    // A bound counts only as a TOP-LEVEL conjunct (doc_id < 50 OR x
    // selects a fact-scaled fraction, so a find() inside the tree
    // would whitewash it) ...
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // ... and it protects only the branch the bound COLUMN comes from:
    // walking down with the set of bounded exprIds, a fact scan is
    // acceptable only if one of its own output attributes carries a
    // bound (a filtered probe branch joined beside an unbounded fact
    // branch must not whitewash the side).
    def boundedOk(p: LogicalPlan,
                  bound: Set[org.apache.spark.sql.catalyst.expressions.ExprId]): Boolean =
      p match {
        case _: GlobalLimit => true
        // a GLOBAL aggregate is one row by construction and so
        // broadcast-safe — but only when every aggregate FUNCTION in
        // it has a bounded payload. This is an ALLOWLIST of
        // known-bounded aggregates (scalar accumulators / fixed-size
        // sketches), not a blacklist of known-unbounded ones: one row
        // of collect_list / listagg / mode / exact percentile over a
        // fact table holds the whole corpus — the exact OOM class
        // this guard bans — and a blacklist silently admits every
        // unbounded aggregate it forgot to name. (A literal limit(1)
        // over a global aggregate would also qualify, but
        // EliminateLimits strips limits subsumed by maxRows before
        // this guard looks.)
        case a: Aggregate if a.groupingExpressions.isEmpty &&
            !a.aggregateExpressions.exists(_.exists {
              case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
                import org.apache.spark.sql.catalyst.expressions.aggregate._
                ae.aggregateFunction match {
                  case _: Count | _: Sum | _: Min | _: Max | _: Average |
                       _: First | _: Last | _: CountIf |
                       _: BitAndAgg | _: BitOrAgg | _: BitXorAgg |
                       _: HyperLogLogPlusPlus => false // bounded: scalar or fixed-size sketch
                  case _ => true // anything else: prove boundedness before broadcasting
                }
              case _ => false
            }) => true
        case f: Filter =>
          val newBound = bound ++ conjuncts(f.condition)
            .filter(isIdRangeBound).flatMap(_.references.map(_.exprId))
          boundedOk(f.child, newBound)
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          !isFact(r) || r.output.exists(a => bound.contains(a.exprId))
        // a checkpointed frame is an opaque leaf: whatever structural
        // bound its ORIGINAL plan carried (a limit, an id-range filter)
        // was erased by the rewrite to LogicalRDD, so its boundedness
        // is UNPROVEN here — the builder must re-cap the materialized
        // frame (a runtime no-op limit) to keep the proof structural
        // (r21 ADVICE #3: the old children.forall fell through to
        // vacuous truth on childless leaves and would hide any
        // fact-scaled side behind a checkpoint)
        case _: org.apache.spark.sql.execution.LogicalRDD => false
        case other => other.children.forall(c => boundedOk(c, bound))
      }
    // ev_stream_* excluded: their memory-sink result plans cannot carry
    // a parquet-side broadcast hint — the check would be vacuous
    frames.filterNot(_._1.startsWith("ev_stream")).foreach { case (name, df) =>
      df.queryExecution.optimizedPlan.foreach {
        case j: Join =>
          Seq(j.left -> j.hint.leftHint, j.right -> j.hint.rightHint).foreach {
            case (side, hint) =>
              if (hint.exists(_.strategy.contains(BROADCAST)))
                assert(boundedOk(side, Set.empty),
                  s"$name: broadcast hint on an unbounded fact-scaled side")
          }
        case _ =>
      }
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
