package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data prep — the operators composed the way a
  * real corpus pipeline chains them, as ONE oracle-checked query:
  *
  *   documents → quality score + filter → exact-dedup survivors →
  *   token counts → per-shard sequence packing
  *
  * Per-operator oracles can't catch compositional bugs (column clashes
  * after joins, filters applied before vs after dedup, pack offsets
  * computed over the wrong row set); this query hash-checks the whole
  * chain against a single DuckDB CTE pipeline.
  *
  * Scale shape: quality and token counts are map-side kernels; the
  * dedup is one hash-shuffle on the content digest; packing windows
  * per shard (never a global-order window). Two shuffles total beyond
  * the scans at any corpus size.
  */
object Pipeline {

  def prepPipeline(s: SparkSession, dir: String, minQuality: Double = 0.5,
                   budget: Long = 512, shards: Int = 8): DataFrame = {
    import s.implicits._
    // quality gate — filter on the floor-truncated score (identical
    // truncation in the oracle, so the boundary comparison agrees)
    val scored = Tables.documents(s, dir)
      .join(TextAnalysis.qualityScore(s, dir).select($"doc_id", $"quality"), "doc_id")
      .filter($"quality" >= minQuality)
    // exact dedup among the quality survivors: keep min doc_id per digest
    val kept = scored.groupBy(sha2($"text", 256).as("digest"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val withTok = scored.join(kept, "doc_id")
      .select($"doc_id", $"quality",
        TextFunctions.textStatsCounts($"text").getItem(1).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    withTok
      .select($"doc_id", ($"doc_id" % shards).as("shard"), $"n_tokens", $"quality")
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"shard",
        floor(($"cum" - $"n_tokens") / budget).cast("long").as("pack_id"),
        $"n_tokens", $"quality")
      .orderBy($"doc_id")
  }
}
