package graft
import java.nio.file.{Files, Paths}

/** Dev-loop subset of [[Verify]]: dump only the queries named in
  * SPARK_GRAFT_QUERIES (comma-separated) plus their oracle SQL, so a
  * new operator can be selfchecked in seconds instead of re-running
  * the whole registry. Same output layout as Verify —
  * `scripts/selfcheck.py <sfDir> <outDir>` consumes it unchanged.
  *
  * Usage:
  *   SPARK_GRAFT_QUERIES=tx_gopher_rep,tx_source_cap \
  *     sbt "runMain graft.VerifySubset /root/testdata/sf0.01 /tmp/out"
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      sys.error("set SPARK_GRAFT_QUERIES=<name>[,<name>…]")).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-verify-subset")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(f"[verify-subset] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // same JSON escaping contract as Verify (control chars included)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
