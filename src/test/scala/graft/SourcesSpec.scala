package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Round-trips through every supported format preserve data exactly,
  * and hive-style partitioning produces prunable directories. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sources").toString

  private lazy val nation = Tables.nation(spark, sfDir)

  test("csv round-trip with explicit schema") {
    val dir = tmp() + "/n.csv"
    Sources.write(nation, dir, "csv")
    // csv loses header by default in our writer -> read back headerless
    val back = Sources.readCsv(spark, dir, nation.schema, header = false)
    assert(back.orderBy($"n_nationkey").collect().toSeq ==
      nation.orderBy($"n_nationkey").collect().toSeq)
  }

  test("json-lines round-trip") {
    val dir = tmp() + "/n.json"
    Sources.write(nation, dir, "json")
    val back = Sources.readJsonLines(spark, dir, nation.schema)
    assert(back.orderBy($"n_nationkey").collect().toSeq ==
      nation.orderBy($"n_nationkey").collect().toSeq)
  }

  test("orc round-trip") {
    val dir = tmp() + "/n.orc"
    Sources.write(nation, dir, "orc")
    assert(Sources.readOrc(spark, dir).orderBy($"n_nationkey").collect().toSeq ==
      nation.orderBy($"n_nationkey").collect().toSeq)
  }

  test("partitioned parquet write prunes directories on read") {
    val dir = tmp() + "/part"
    Sources.write(nation, dir, "parquet", partitionByCols = Seq("n_regionkey"))
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(subdirs.count(_.startsWith("n_regionkey=")) == 5)
    val one = Sources.readParquet(spark, dir).filter($"n_regionkey" === 2)
    // partition pruning: only the matching directory is scanned
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() == nation.filter($"n_regionkey" === 2).count())
    assert(scanned.contains("PartitionFilters: [isnotnull(n_regionkey"), scanned)
  }
}
