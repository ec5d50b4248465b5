package graft
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]", 8, "dbg")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topIds(operators.Similarity.bruteForceTopK(spark, dir))
    for ((name, df) <- Seq(
        "pq" -> operators.Similarity.pqTopK(spark, dir),
        "ivf_pq" -> operators.Similarity.ivfPqTopK(spark, dir),
        "ivf_trained" -> operators.Similarity.ivfTrainedTopK(spark, dir))) {
      val got = topIds(df)
      val ov = exact.keySet.toSeq.map(q => (got(q) & exact(q)).size.toDouble / exact(q).size)
      println(f"[dbg] $name recall vs brute = ${ov.sum / ov.size}%.3f")
    }
    spark.stop()
  }
}
