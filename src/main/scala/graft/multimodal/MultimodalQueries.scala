package graft.multimodal

import graft.QuerySpec
import graft.functions.Exprs._
import org.apache.spark.sql.functions._

/** Rows-only QuerySpecs for the multimodal plumbing (binary payloads are
  * synthesized — no oracle table exists; shapes and determinism are asserted
  * in MultimodalSpec). */
object MultimodalQueries {

  val q70DecodeFeatures: QuerySpec = QuerySpec.rowsOnly("q70_media_features") { (spark, dir) =>
    val media = Multimodal.syntheticMedia(spark, 2000)
    Multimodal.decodeFeatures(media)
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        avg("n_bytes").as("avg_bytes"),
        round(avg(element_at(col("embedding"), 1)), 6).as("avg_dim0"))
      .orderBy("kind")
  }

  val q71FrameSample: QuerySpec = QuerySpec.rowsOnly("q71_frame_sample") { (spark, dir) =>
    val media = Multimodal.syntheticMedia(spark, 2000)
    Multimodal.sampleFrames(media, everyN = 5)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled"), min("frame_fp").as("min_fp"))
      .orderBy("media_id")
  }

  /** Container-metadata extraction over the video rows: the synthetic
    * payloads are not BMFF, so every row exercises the documented fallback
    * path deterministically (parsed = false, duration from metadata);
    * MultimodalSpec covers the parsed = true path with a real MP4. */
  val q72VideoMeta: QuerySpec = QuerySpec.rowsOnly("q72_video_meta") { (spark, dir) =>
    val media = Multimodal.syntheticMedia(spark, 2000)
    Multimodal.videoMetadata(media).toDF()
      .groupBy("parsed")
      .agg(count(lit(1)).as("n_videos"),
        asLong(sum(col("duration"))).as("total_duration"))
      .orderBy("parsed")
  }

  val all: Seq[QuerySpec] = Seq(q70DecodeFeatures, q71FrameSample, q72VideoMeta)
}
