package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-count parity pipeline — the reference's single application,
  * re-expressed as one declarative Spark plan.
  *
  * Reference semantics (`/root/reference/map_reduce/wordcount.go:10-22`):
  *   1. split on whitespace runs (Go `strings.Fields`)
  *   2. strip *runs* of `.,!?"':;()` from both ends (Go `strings.Trim`)
  *   3. lowercase
  *   4. drop empty tokens
  *   5. count per word (`wordcount.go:26-32`)
  *
  * This single pipeline covers reference operators O1-O10 (SURVEY.md §2.1):
  * scan, flatMap (explode), project, filter, hash shuffle (groupBy),
  * group, per-key count, sort, sink. The shuffle is preceded by a
  * partial aggregate (map-side combine) that the reference lacks
  * (`worker.go:152-159` ships every ("word","1") pair) — Spark inserts
  * HashAggregate(partial) automatically, which is the single biggest
  * scale win: shuffle volume is O(distinct words per partition), not
  * O(tokens). Zipf skew (SURVEY.md §7.5) is absorbed the same way.
  */
object WordCount {

  /** Java-regex equivalent of Go `strings.Trim(w, ".,!?\"':;()")` —
    * strips leading+trailing runs of the cutset. regexp_replace removes
    * every match, so one pattern handles both ends. */
  val TrimPattern = "^[.,!?\"':;()]+|[.,!?\"':;()]+$"

  /** Tokenize a text column with exact reference semantics; yields one
    * row per non-empty token. */
  def tokenize(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("raw"))
      .select(lower(regexp_replace(col("raw"), TrimPattern, "")).as("word"))
      .filter(col("word") =!= "")

  /** The flagship query: word frequencies over `documents.text`,
    * deterministically ordered. */
  def wordCount(docs: DataFrame): DataFrame =
    tokenize(docs, "text")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Word count over raw text files (the Gutenberg corpus path) —
    * `spark.read.text` replaces worker.go:126's whole-file read; one
    * input split per HDFS block at scale, not one task per file. */
  def wordCountText(lines: DataFrame): DataFrame =
    wordCountCol(lines, col("value"))

  private def wordCountCol(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, "\\s+")).as("raw"))
      .select(lower(regexp_replace(col("raw"), TrimPattern, "")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** O9: tab-separated sink (`worker.go:224-239` writes `key\tvalue`).
    * One file per partition, exactly like `mr-out-<reduceID>`. */
  def writeTsv(df: DataFrame, path: String, partitions: Int = 1): Unit =
    df.repartition(partitions)
      .write.mode("overwrite")
      .option("sep", "\t")
      .csv(path)
}
