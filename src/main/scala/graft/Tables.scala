package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (/root/repo/TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst can push filters and prune
  * columns into the scan (verify with `.explain("formatted")` —
  * `PushedFilters` / `ReadSchema` must reflect the query, not the table).
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.ts has shipped under two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * with [PARQUET_TYPE_ILLEGAL] — read as raw nanos and floor to micros,
    * matching DuckDB's ns→µs truncation) and plain TIMESTAMP_MICROS
    * (read natively). Adapt on the footer schema so both load identically;
    * NTZ casts to session-TZ timestamp, value-identity under the engine's
    * fixed UTC session (graft.GraftSession).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so `spark.sql("...")` works over
    * the star schema — the engine's ad-hoc SQL surface.
    */
  def registerAll(s: SparkSession, dir: String): Unit = {
    val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> region _, "nation" -> nation _, "customer" -> customer _,
      "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
      "lineitem" -> lineitem _, "events" -> events _,
      "documents" -> documents _, "embeddings" -> embeddings _)
    names.foreach(n => loaders(n)(s, dir).createOrReplaceTempView(n))
  }
}
