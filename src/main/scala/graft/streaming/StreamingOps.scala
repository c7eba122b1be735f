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
