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
    * (read natively). Adapt on the footer schema so both load identically.
    *
    * Loader contract: `ts` values are UTC wall-clock instants regardless
    * of the caller's session timezone. The NANOS path is TZ-independent
    * arithmetic; the MICROS path's NTZ→timestamp cast is interpreted in
    * the session TZ **at analysis time**, so the cast is built under a
    * scoped UTC pin and the caller's timezone restored before returning
    * (ResolveTimeZone freezes the zone into the analyzed plan, so the
    * restore cannot shift execution; spec-pinned in RuntimeSpec).
    *
    * Known session-global side effect: `nanosAsLong` must REMAIN set —
    * parquet footer schemas are re-converted inside every scan task at
    * execution time, long after this function returns, so a set-restore
    * here would fail the job at the first action. The conf only changes
    * how nanos-typed parquet columns load (they are otherwise unreadable),
    * so a second nanos consumer sees Long — exactly what this adapter
    * expects — and every other type is untouched.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } finally s.conf.set("spark.sql.session.timeZone", prevTz)
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
