package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ProtoWire, WireCodecs}

/** Byte-level codecs from the reference's storage/wire surface:
  * 40-bit expiry (F11), bool bit-packing (F12), protobuf persist
  * events (F15/S7). */
class WireCodecSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("expiry 40-bit round-trip across the full range (F11)") {
    val df = Seq(0L, 1L, 1700000000L, WireCodecs.Max40).toDF("t")
    val rt = df.select(
      WireCodecs.decodeExpiry40(WireCodecs.encodeExpiry40($"t")).as("r"),
      length(WireCodecs.encodeExpiry40($"t")).as("len"))
      .as[(Long, Int)].collect()
    assert(rt.map(_._1).toSeq === Seq(0L, 1L, 1700000000L, WireCodecs.Max40))
    assert(rt.map(_._2).forall(_ === 5), "always exactly 5 bytes")
  }

  test("bool bit-packing: 8 per byte, LSB first, round-trip (F12)") {
    val bools = Seq(true, false, true, true, false, false, false, true, true, false)
    val df = Seq(Tuple1(bools)).toDF("b")
    val packed = df.select(WireCodecs.packBools($"b").as("p"))
    val bytes = packed.as[Array[Byte]].head()
    assert(bytes.length === 2) // ceil(10/8)
    assert((bytes(0) & 0xff) === 0x8d) // 10110001 reading LSB-first
    assert((bytes(1) & 0xff) === 0x01)
    val rt = packed.select(WireCodecs.unpackBools($"p", lit(bools.length)))
      .as[Seq[Boolean]].head()
    assert(rt === bools)
  }

  test("protobuf persist event: golden bytes + round-trip (F15/S7)") {
    val df = Seq(("u", "k1", 300L, Seq(1.0f)))
      .toDF("entity", "key", "version", "values")
    val enc = df.select(
      ProtoWire.protoEncode($"entity", $"key", $"version", $"values").as("b"))
    val bytes = enc.as[Array[Byte]].head()
    // hand-computed proto3 wire bytes for {entity:"u", key:"k1",
    // version:300, values:[1.0]}
    val golden = Array(
      0x0a, 0x01, 'u'.toInt, 0x12, 0x02, 'k'.toInt, '1'.toInt,
      0x18, 0xac, 0x02, 0x22, 0x04, 0x00, 0x00, 0x80, 0x3f).map(_.toByte)
    assert(bytes.toSeq === golden.toSeq)
    val dec = enc.select(ProtoWire.protoDecode($"b").as("m")).select("m.*")
      .as[(String, String, Long, Seq[Float])].head()
    assert(dec === (("u", "k1", 300L, Seq(1.0f))))
  }

  test("protobuf round-trip over a real table incl. unicode and empties") {
    val docs = Tables.orders(spark, sf).limit(200)
      .select($"o_orderkey".cast("string").as("entity"),
        concat_ws("|", $"o_orderstatus", $"o_orderpriority").as("key"),
        $"o_orderkey".as("version"),
        array($"o_totalprice".cast("float")).as("values"))
      .unionByName(Seq(("日本語", "", 0L, Seq.empty[Float]))
        .toDF("entity", "key", "version", "values"))
    val rt = docs.select(ProtoWire.protoDecode(
        ProtoWire.protoEncode($"entity", $"key", $"version", $"values")).as("m"))
      .select("m.*")
      .as[(String, String, Long, Seq[Float])].collect()
    val orig = docs.as[(String, String, Long, Seq[Float])].collect()
    assert(rt.toSeq === orig.toSeq)
  }
}
