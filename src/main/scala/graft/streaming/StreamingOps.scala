package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.J).
  *
  * The reference is strictly batch; its incremental behavior is cache
  * tables (get_pdb_parity.py:157-196). The natural streaming extension —
  * new PDB releases / new events arriving continuously — is expressed
  * here as plan-builders that work identically on a batch DataFrame and a
  * streaming one (`readStream`): the same code path, which is how the
  * engine keeps batch/stream parity testable.
  */
object StreamingOps {

  /** Tumbling-window aggregation with a watermark: the streaming form of
    * e2_hourly_agg. On a batch input the watermark is a no-op and the
    * result equals the batch groupBy — asserted in StreamingSpec.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("val_milli"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("val_milli"))
  }

  /** Incremental cache upsert (the C11 parity-cache pattern as a stream):
    * per micro-batch, left-anti against the cache to find new pairs —
    * the shape a `foreachBatch` sink runs to maintain the parity cache.
    */
  def newPairsAgainstCache(batch: DataFrame, cache: DataFrame): DataFrame =
    batch.join(cache, Seq("pair_key"), "left_anti")
}
