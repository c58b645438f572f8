package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: the write-once investment that removes the
  * per-query shuffle from repeated joins/aggregations on a key
  * (SCALING.md §2, fact-fact joins row). A table bucketed (and sorted)
  * by its join key carries its partitioning in the catalog; joins and
  * aggregations on that key then plan with ZERO Exchange on the bucketed
  * side — at 100 TB that converts every repeated fact-fact join from two
  * corpus shuffles into none. BucketingSpec pins the exchange-free plans.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed by `key` into the session
    * catalog (`saveAsTable` — bucketing metadata lives in the catalog, so
    * a path-based write cannot carry it). Sorting within buckets makes
    * sort-merge joins skip their per-task sort too.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata applies automatically). */
  def readBucketed(s: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    s.table(table)
}
