package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal column plumbing: binary representation, batch-shaped
  * decode, stub featurization, frame sampling. */
class MultimodalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha"), (2L, "bravo charlie"), (3L, "")
  ).toDF("id", "text")
    .select($"id", encode($"text", "UTF-8").as("media"))

  test("decodeMeta appends a typed struct; schema and values deterministic") {
    val out = Multimodal.decodeMeta(docs, "media", batchSize = 2)
    assert(out.schema.fieldNames.toSeq === Seq("id", "media", "media_meta"))
    assert(out.schema("media_meta").dataType === Multimodal.metaSchema)
    val rows = out.select($"id", $"media_meta.format", $"media_meta.n_bytes")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    // 'a' = 97 → 97%3=1 → jpeg; 'b' = 98 → 98%3=2 → webp; empty → b0=0 → png
    assert(rows === Array((1L, "jpeg", 5), (2L, "webp", 13), (3L, "png", 0)))
  }

  test("decodeMeta: null media yields null meta, other columns intact") {
    val withNull = docs.withColumn("media",
      when($"id" === 2L, lit(null).cast("binary")).otherwise($"media"))
    val out = Multimodal.decodeMeta(withNull, "media")
    assert(out.filter($"media_meta".isNull).select("id").as[Long].collect()
      === Array(2L))
    assert(out.count() === 3)
  }

  test("featurizeStub: fixed dim, deterministic, values in [0,1]") {
    val f = docs.select($"id", Multimodal.featurizeStub($"media", dim = 8).as("emb"))
    val rows = f.select($"id", $"emb").as[(Long, Seq[Double])].collect()
    assert(rows.forall(_._2.length === 8))
    assert(rows.forall(_._2.forall(v => v >= 0.0 && v <= 1.0)))
    val again = docs.select(Multimodal.featurizeStub($"media", dim = 8).as("emb"))
      .as[Seq[Double]].collect()
    assert(rows.map(_._2).toSeq === again.toSeq)
    // distinct inputs → distinct embeddings
    assert(rows.map(_._2).distinct.length === 3)
  }

  test("imageDims parses PNG/JPEG/GIF headers, null on junk") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = hexBytes("89504E470D0A1A0A0000000D49484452" +
      "00000280" + "000001E0" + "0806000000")  // 640x480
    // JPEG: APP0 segment, a fill byte, then SOF2 (progressive)
    val jpeg = hexBytes("FFD8" + "FFE000104A46494600010100000100010000" +
      "FF" + "FFC2001108" + "0100" + "0180" + "03012200021101031101")
    val gif = hexBytes("474946383961" + "2003" + "5802" + "00")  // 800x600
    val rows = Seq(png, jpeg, gif, "notanimage".getBytes,
      Array.empty[Byte], png.take(10))
      .map(Tuple1(_)).toDF("bin")
      .select(Multimodal.imageDims($"bin").as("m"))
      .select($"m.format", $"m.width", $"m.height").collect()
    assert(rows(0).toSeq === Seq("png", 640, 480))
    assert(rows(1).toSeq === Seq("jpeg", 384, 256))
    assert(rows(2).toSeq === Seq("gif", 800, 600))
    for (i <- 3 to 5) assert(rows(i).toSeq === Seq(null, null, null), s"$i")
  }

  test("wavMeta parses the RIFF fmt block, null on junk") {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(2)          // PCM, stereo
    bb.putInt(44100); bb.putInt(44100 * 4)  // rate, byte rate
    bb.putShort(4); bb.putShort(16)         // block align, bits
    val wav = bb.array()
    val rows = Seq(wav, "RIFFjunk".getBytes, Array.empty[Byte])
      .map(Tuple1(_)).toDF("bin")
      .select(Multimodal.wavMeta($"bin").as("m"))
      .select($"m.channels", $"m.sample_rate", $"m.bits_per_sample")
      .collect()
    assert(rows(0).toSeq === Seq(2, 44100, 16))
    assert(rows(1).toSeq === Seq(null, null, null))
    assert(rows(2).toSeq === Seq(null, null, null))
  }

  test("cleanText strips controls and composes NFC") {
    import graft.functions.TextFunctions.cleanText
    val rows = Seq("cafe\u0301 ok", "a\u0007bc", "plain", "")
      .toDF("t").select(cleanText($"t")).as[String].collect()
    assert(rows(0) === "caf\u00e9 ok") // combining acute composes
    assert(rows(1) === "abc")
    assert(rows(2) === "plain")
    assert(rows(3) === "")
  }

  test("compressionRatio separates repetitive from varied text") {
    import graft.functions.TextFunctions.compressionRatio
    val rep = "spam spam spam spam " * 50
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val got = Seq(rep, varied, "").toDF("t")
      .select(compressionRatio($"t")).as[Double].collect()
    assert(got(0) < 0.1)            // boilerplate crushes
    assert(got(1) > got(0) * 3)     // varied text compresses far less
    assert(got(2) === 1.0)          // empty-string convention
    // deterministic across evaluations
    val again = Seq(rep).toDF("t")
      .select(compressionRatio($"t")).as[Double].head()
    assert(again === got(0))
  }

  test("frameSample keeps every stride-th frame, order preserved") {
    val frames = Seq(Tuple1(Seq("f0", "f1", "f2", "f3", "f4").map(_.getBytes)))
      .toDF("frames")
    val out = frames.select(Multimodal.frameSample($"frames", 2).as("kept"))
      .as[Seq[Array[Byte]]].head()
    assert(out.map(new String(_)) === Seq("f0", "f2", "f4"))
  }
}
