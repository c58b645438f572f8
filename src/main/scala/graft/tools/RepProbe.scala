package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the scale corpora: band-bucket size
  * distribution of the minhash band join, per replica.
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 32; val rpb = 8
    val sig = graft.Tables.documents(spark, args(0))
      .select(col("doc_id"), graft.functions.MinHashSig(col("text"), 5, k).as("sig"))
    val bandCols = (0 until k / rpb).map { b =>
      concat_ws(":", (0 until rpb).map(j => element_at(col("sig"), b * rpb + j + 1)): _*)
    }
    val bands = sig
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bsig")
    bands
      .groupBy(floor(col("doc_id") / 1000000L).as("rep"), col("band"), col("bsig"))
      .count().filter(col("count") > 5)
      .orderBy(col("count").desc)
      .show(20, false)
    spark.stop()
  }
}
