package graft.ops

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.CrossHash.{h60Local, h60Sql}

/** Multimodal-column plumbing (the training-data-pipeline surface): media
  * payloads are opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as a *batched partition map* over a
  * typed `Dataset` — the Scala analog of `mapInPandas` (iterator of
  * fixed-size batches in, iterator of feature rows out), which is the shape
  * that scales: executors stream batches without materializing a partition,
  * and the feature schema is declared up front so Catalyst plans around it.
  *
  * The actual media decoding is a STUB by design (no image/audio codecs in
  * this environment): [[Multimodal.decodeBatch]] produces deterministic fake
  * features (byte length, md5-derived 60-bit fingerprint, fingerprint-derived
  * fake dimensions) so the pipeline is end-to-end verifiable against the
  * DuckDB oracle. A real deployment swaps ONLY the body of `decodeBatch` for
  * a codec call; every Spark-side contract (binary payloads, batch iterator,
  * feature schema, partitioning) stays identical.
  */
object Multimodal {

  /** One media row: opaque payload + routing metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Declared feature schema of the decode stage. */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, fp60: Long, width: Int, height: Int)

  /** Arrow-like batch size of the partition map (mapInPandas analog). */
  val DecodeBatchSize = 64

  /** STUB decoder: deterministic fake features from the raw bytes. The md5
    * fingerprint mirrors the SQL oracle's h60; width/height are arithmetic
    * functions of it (standing in for decoded media dimensions). */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val fp = h60Local(new String(r.payload, "UTF-8"))
      MediaFeatures(r.doc_id, r.media_type,
        n_bytes = r.payload.length.toLong,
        fp60 = fp,
        width  = (fp % 1856L + 64L).toInt,
        height = (fp % 1016L + 64L).toInt)
    }

  /** Frame-sampling stub: treat the payload as fixed-size 16-byte "frames"
    * (trailing partial dropped), sample every 4th, fingerprint each sampled
    * frame. A real video decoder replaces frame extraction; the sampling
    * cadence, per-doc aggregation and feature schema are the real contract. */
  final case class FrameFeatures(doc_id: Long, n_frames: Long, n_sampled: Long,
                                 fp_first: Long, fp_sum_mod: Long)
  val FrameBytes = 16
  val SampleEvery = 4
  val FpMod = 1000000007L

  def frameSampleBatch(batch: Seq[MediaRecord]): Seq[FrameFeatures] =
    batch.flatMap { r =>
      val nFrames = r.payload.length / FrameBytes
      if (nFrames == 0) None
      else {
        val sampled = (0 until nFrames by SampleEvery).map { i =>
          h60Local(new String(r.payload, i * FrameBytes, FrameBytes, "UTF-8"))
        }
        Some(FrameFeatures(r.doc_id, nFrames.toLong, sampled.size.toLong,
          sampled.head, sampled.map(_ % FpMod).sum % FpMod))
      }
    }

  def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q76_frame_sample",
      "Video-style frame sampling over binary payloads: 16-byte frames, every 4th sampled and fingerprinted in the batched decode stub; per-doc frame counts and fingerprint digest. Oracle regenerates frames arithmetically (corpus is ASCII, so char and byte offsets agree).",
      s"""WITH f AS (SELECT doc_id, u.i AS i,
         |    ${h60Sql("substr(text, CAST(u.i * 16 + 1 AS INTEGER), 16)")} AS fp
         |  FROM documents,
         |    LATERAL unnest(generate_series(0, len(text) // 16 - 1)) AS u(i)
         |  WHERE len(text) >= 16 AND u.i % 4 = 0)
         |SELECT doc_id,
         |  (SELECT len(text) // 16 FROM documents d2 WHERE d2.doc_id = f.doc_id) AS n_frames,
         |  count(*) AS n_sampled,
         |  max(CASE WHEN i = 0 THEN fp END) AS fp_first,
         |  CAST(sum(fp % 1000000007) % 1000000007 AS BIGINT) AS fp_sum_mod
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val records = Tables.documents(s, d)
        .select(col("doc_id"), lit("video").as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaRecord]
      records
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(frameSampleBatch))
        .toDF()
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q62_multimodal_features",
      "Binary media ingest + batched decode stub: documents become (binary payload, media_type) records, mapPartitions streams 64-row batches through the feature extractor (mapInPandas shape), emitting the declared feature schema. Deterministic stub features keep the pipeline oracle-verifiable.",
      s"""SELECT doc_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         |  ${h60Sql("text")} AS fp60,
         |  CAST(${h60Sql("text")} % 1856 + 64 AS INTEGER) AS width,
         |  CAST(${h60Sql("text")} % 1016 + 64 AS INTEGER) AS height
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val records = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaRecord]
      records
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
        .toDF()
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q63_media_type_stats",
      "Downstream aggregation over the decoded feature frame: per media type, corpus bytes, mean fake-pixel count, and distinct fingerprints — the dedup/inventory pass of a media pipeline.",
      s"""WITH f AS (SELECT doc_id,
         |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         |    ${h60Sql("text")} AS fp60,
         |    CAST(${h60Sql("text")} % 1856 + 64 AS INTEGER) AS width,
         |    CAST(${h60Sql("text")} % 1016 + 64 AS INTEGER) AS height
         |  FROM documents)
         |SELECT media_type,
         |  count(*) AS n_items,
         |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         |  CAST(sum(CAST(width AS BIGINT) * CAST(height AS BIGINT)) AS BIGINT) AS total_pixels,
         |  count(DISTINCT fp60) AS n_distinct_fp
         |FROM f GROUP BY media_type ORDER BY media_type""".stripMargin) { (s, d) =>
      import s.implicits._
      val records = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaRecord]
      records
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
        .toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("width").cast("long") * col("height").cast("long")).as("total_pixels"),
          countDistinct(col("fp60")).as("n_distinct_fp"))
        .orderBy(col("media_type"))
    }
  )
}
