package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.FeatureType
import graft.core.FeatureType._
import graft.functions.Decode

/** Display decoding across the 30-type surface (SURVEY F8): one
  * deterministic string rendering per logical type, engine-portable
  * (floats via DECIMAL(30,6), the q35/q36 oracle convention). */
class DecodeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("scalar display strings for every scalar feature type") {
    val df = Seq(1).toDF("x")
    def show(c: org.apache.spark.sql.Column, t: FeatureType): String =
      df.select(Decode.display(c, t).as("s")).as[String].head()
    assert(show(lit(1.5f), FP32) === "1.500000")
    assert(show(lit(-2.25), FP64) === "-2.250000")
    assert(show(lit(0.5f), FP16) === "0.500000")
    assert(show(lit(0.5f), FP8E4M3) === "0.500000")
    assert(show(lit(0.5f), FP8E5M2) === "0.500000")
    assert(show(lit(127.toByte), Int8) === "127")
    assert(show(lit(-32768.toShort), Int16) === "-32768")
    assert(show(lit(Int.MaxValue), Int32) === "2147483647")
    assert(show(lit(Long.MinValue), Int64) === "-9223372036854775808")
    assert(show(lit(255.toShort), Uint8) === "255")
    assert(show(lit(65535), Uint16) === "65535")
    assert(show(lit(4294967295L), Uint32) === "4294967295")
    assert(show(lit("18446744073709551615").cast(Uint64.sparkType), Uint64)
      === "18446744073709551615")
    assert(show(lit("graft"), Str) === "graft")
    assert(show(lit(true), Bool) === "true")
  }

  test("vector display joins elements with commas for every vector type") {
    val df = Seq(1).toDF("x")
    def showVec(c: org.apache.spark.sql.Column, t: FeatureType): String =
      df.select(Decode.displayVector(c, t).as("s")).as[String].head()
    assert(showVec(array(lit(1.0), lit(2.5)), FP64) === "1.000000,2.500000")
    assert(showVec(array(lit(1), lit(2), lit(3)), Int32) === "1,2,3")
    assert(showVec(array(lit(true), lit(false)), Bool) === "true,false")
    assert(showVec(array(lit("a"), lit("b")), Str) === "a,b")
    assert(showVec(array(), FP32) === "")
  }
}
