package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("media table derives deterministic metadata and binary payloads") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.filter(col("kind").isin("image", "audio", "video") === false).isEmpty)
    // payload bytes == n_chars of the source text (ascii corpus)
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val bad = m.join(d, col("media_id") === col("doc_id"))
      .filter(length(col("payload")) =!= col("n_chars"))
    assert(bad.isEmpty)
  }

  test("stub decode yields n_frames frames of FRAME_PX pixels per media") {
    val m = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.decodeFrames(m)
    val expected = m.agg(sum("n_frames")).first().getLong(0)
    assert(frames.count() == expected)
    assert(frames.filter(size(col("pixels")) =!= Multimodal.FRAME_PX).isEmpty)
    // byte-range pixels
    val ex = frames.select(explode(col("pixels")).as("px"))
    assert(ex.filter(col("px") < 0 || col("px") > 255).isEmpty)
  }

  test("frame sampling keeps every stride-th frame") {
    val frames = Multimodal.decodeFrames(Multimodal.mediaTable(spark, sf))
    val sampled = Multimodal.sampleFrames(frames, 2)
    assert(sampled.filter(col("frame_no") % 2 =!= 0).isEmpty)
    assert(sampled.count() ==
      frames.filter(col("frame_no") % 2 === 0).count())
  }

  test("resize emits 16 block-averaged pixels in byte range") {
    val r = Multimodal.resizeFrames(
      Multimodal.decodeFrames(Multimodal.mediaTable(spark, sf)).toDF())
    assert(r.filter(size(col("pixels_4x4")) =!= 16).isEmpty)
    val ex = r.select(explode(col("pixels_4x4")).as("px"))
    assert(ex.filter(col("px") < 0 || col("px") > 255).isEmpty)
  }

  test("media features are internally consistent") {
    val f = Multimodal.mediaFeatures(spark, sf)
    assert(f.count() > 0)
    assert(f.filter(col("min_px") > col("mean_px") ||
      col("mean_px") > col("max_px")).isEmpty)
    assert(f.filter(col("n_pixels") =!= col("n_frames") * Multimodal.FRAME_PX).isEmpty)
  }

  test("corpus is pure ASCII (precondition of the mediaFeatures SQL oracle)") {
    // mediaFeaturesSql re-derives StubCodec's byte math with DuckDB's
    // CHARACTER-indexed substr/ascii — valid only while every payload
    // byte is a single ASCII char. A non-ASCII doc (or an empty text,
    // which the codec zero-fills but the oracle can't) must fail HERE,
    // not as an opaque oracle hash flip.
    val bad = Tables.documents(spark, sf)
      .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")) ||
        length(col("text")) === 0 || col("text").isNull)
    assert(bad.isEmpty, "non-ASCII or empty documents break the mediaFeatures oracle")
  }

  test("magic-byte sniffing detects planted container headers, text falls through") {
    import spark.implicits._
    def planted(header: Array[Int], tail: String = "rest-of-payload") =
      header.map(_.toByte) ++ tail.getBytes("UTF-8")
    val rows = Seq(
      ("png", planted(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))),
      ("jpeg", planted(Array(0xFF, 0xD8, 0xFF, 0xE0))),
      ("gif", "GIF89a-pretend-image".getBytes("UTF-8").map(_.toInt)
        .map(identity).map(_.toByte) ++ Array.emptyByteArray),
      ("riff", planted(Array(0x52, 0x49, 0x46, 0x46)) ++ "WAVE".getBytes),
      ("pdf", "%PDF-1.7 pretend".getBytes("UTF-8")),
      ("data", "just some plain text".getBytes("UTF-8")),
      ("data", planted(Array(0x00, 0x01, 0x02)))) // unknown binary → data
    val df = rows.zipWithIndex
      .map { case ((exp, bytes), i) => (i.toLong, exp, bytes) }
      .toDF("id", "expected", "payload")
    val got = df.withColumn("detected", Multimodal.sniffKind(col("payload")))
    assert(got.filter(col("detected") =!= col("expected")).isEmpty,
      got.collect().mkString(";"))
    // and the real corpus payloads (UTF-8 text) all fall through to data
    val corpus = Multimodal.mediaTable(spark, sf)
      .withColumn("detected", Multimodal.sniffKind(col("payload")))
    assert(corpus.filter(col("detected") =!= "data").isEmpty)
  }
}
