package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-bench")
    // Warm up the JVM/codegen/shuffle machinery so the first timed
    // query doesn't absorb session initialization (~4 s otherwise).
    SparkEntry.queries.get("q1_pricing")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    val results = SparkEntry.queries.map { case (name, fn) =>
      // noop sink: evaluates every output column and row (count() would
      // let Catalyst prune computed columns and measure a cheaper plan).
      // min of 2 runs: the second run reuses compiled codegen, so the
      // reported number is steady-state query time, not janino time.
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
