package graft

import graft.operators.Sampling

/** Deterministic-sampling invariants: the properties hash-keyed
  * sampling promises and RNG sampling can't. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("consistent sample: repeatable, and nested across rates") {
    val s256a = Sampling.consistentSample(spark, sfDir, 256)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s256b = Sampling.consistentSample(spark, sfDir, 256)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s512 = Sampling.consistentSample(spark, sfDir, 512)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s256a == s256b)              // run-to-run stable
    assert(s256a.subsetOf(s512))        // a smaller rate nests in a larger
    assert(s256a.nonEmpty && s512.size > s256a.size)
  }

  test("train/val/test split is disjoint, exhaustive, and ~90/5/5") {
    val rows = Sampling.trainValTest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.length == total)                   // every doc labeled once
    assert(rows.map(_._1).distinct.length == rows.length)
    val frac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / total).toMap
    assert(frac("train") > 0.8 && frac("train") < 0.98, frac.toString)
    assert(frac.getOrElse("val", 0.0) < 0.15 && frac.getOrElse("test", 0.0) < 0.15)
  }

  test("stratified sample honors the per-stratum quota") {
    val got = Sampling.stratifiedSample(spark, sfDir, perStratum = 5).collect()
    val perLang = got.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 5), perLang.toMap.toString)
    // ranks are dense 1..n within each stratum
    got.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length))
    }
  }
}
