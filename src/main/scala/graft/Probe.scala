package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan/skew probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.lift(1).contains("streaming")) {
      val staged = streaming.StreamingOps.stageEventsDir(spark, dir,
        java.nio.file.Files.createTempDirectory("probe-stream").toString + "/events")
      val out = streaming.StreamingOps.runToMemory(
        streaming.StreamingOps.tumblingCounts(
          streaming.StreamingOps.eventsStream(spark, staged)),
        "probe_tumbling",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      println(s"streaming_windows=${out.count()}")
      out.orderBy($"win_start", $"event_type").show(5)
      val dup = java.nio.file.Files.createTempDirectory("probe-dup").toString + "/events"
      val ev = Tables.events(spark, dir)
      ev.union(ev).write.mode("overwrite").parquet(dup)
      val deduped = streaming.StreamingOps.runToMemory(
        streaming.StreamingOps.streamingDedup(
          streaming.StreamingOps.eventsStream(spark, dup), Seq("event_id"), "10 days"),
        "probe_dedup")
      println(s"dedup: in=${ev.count() * 2} out=${deduped.count()}")
      spark.stop()
      return
    }
    if (args.lift(1).contains("plans")) {
      args.drop(2).foreach { q =>
        println(s"===== $q =====")
        SparkEntry.queries(q)(spark, dir).explain("formatted")
      }
      spark.stop()
      return
    }
    if (args.lift(1).contains("sql")) {
      GraftExtensions.register(spark)
      Tables.documents(spark, dir).createOrReplaceTempView("docs")
      spark.sql(
        """SELECT graft_fnv1a32(text) AS h, graft_simhash64(text) AS sh,
          |  graft_minhash(text)[0] AS mh0 FROM docs LIMIT 3""".stripMargin).show()
      spark.stop()
      return
    }
    val docs = Tables.documents(spark, dir)
    val sig = operators.Dedup.minhashSig(
      operators.Dedup.normText($"text"), 5, 16)
    val t0 = System.nanoTime()
    val signed = docs.select($"doc_id", sig.as("sig")).cache()
    println(s"n_docs=${signed.count()} sig_time=${(System.nanoTime()-t0)/1e9}")
    val bandHashes = array((0 until 4).map(b =>
      xxhash64(lit(b), slice($"sig", b * 4 + 1, 4))): _*)
    val banded = signed.select($"doc_id",
      posexplode(bandHashes).as(Seq("band", "bucket"))).cache()
    banded.groupBy($"band", $"bucket").count()
      .select(sum($"count" * ($"count" - 1) / 2).as("cand_pairs"),
        max($"count").as("max_bucket")).show()
    spark.stop()
  }
}
