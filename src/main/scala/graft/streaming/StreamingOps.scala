package graft.streaming

import graft.pipeline.KgPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-streaming twins of the batch operators: a continuously
  * arriving webtext/event feed drives the same aggregation logic through
  * readStream + watermark. The reference is batch-only (SURVEY.md §1.3);
  * these exist for the streaming-ingest path of a production corpus where
  * crawl snapshots land incrementally.
  */
object StreamingOps {

  /** Streaming mention counts over an arriving webtext directory: same
    * bigram extraction as KgPipeline.extractMentions, windowed by ingest
    * time with a watermark. Complete-output top mentions land in an
    * in-memory table for the smoke test. */
  def streamingMentions(spark: SparkSession, inputDir: String, schema: org.apache.spark.sql.types.StructType,
                        queryName: String = "mentions"): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    stream.select(explode(KgPipeline.mentionBigrams(col("text"))).as("mention"))
      .groupBy("mention").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Append-mode, watermarked streaming mention counts — the production
    * shape (bounded state: windows are evicted once the watermark passes,
    * unlike the complete-mode smoke above). Corpus rows are stamped into an
    * ingest-hour window; a sentinel row (doc_id < 0, empty text — yields no
    * mentions) arrives 3 hours later and advances the watermark past the
    * corpus window so AvailableNow's final no-data micro-batch flushes the
    * closed window's counts to the sink. The watermark is attached BEFORE
    * the mention explode so the mention-less sentinel still advances it. */
  def streamingMentionsAppend(spark: SparkSession, docsDir: String,
                              docsSchema: org.apache.spark.sql.types.StructType,
                              sentinelDir: String,
                              sentinelSchema: org.apache.spark.sql.types.StructType,
                              queryName: String = "mentions_append"): StreamingQuery = {
    val base = lit("2026-01-01 00:30:00").cast("timestamp")
    val flush = lit("2026-01-01 03:00:00").cast("timestamp")
    val docs = spark.readStream.schema(docsSchema).parquet(docsDir)
      .select(col("doc_id"), col("text"))
    val sentinel = spark.readStream.schema(sentinelSchema).parquet(sentinelDir)
      .select(col("doc_id"), col("text"))
    docs.union(sentinel)
      .withColumn("ts", when(col("doc_id") >= 0, base).otherwise(flush))
      .withWatermark("ts", "1 hour")
      .select(col("ts"), explode(KgPipeline.mentionBigrams(col("text"))).as("mention"))
      .groupBy(window(col("ts"), "1 hour"), col("mention"))
      .agg(count(lit(1)).as("freq"))
      .select(col("mention"), col("freq"))
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming hourly event aggregation with a watermark (append mode). */
  def streamingEventAgg(spark: SparkSession, inputDir: String,
                        schema: org.apache.spark.sql.types.StructType,
                        queryName: String = "event_agg"): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
