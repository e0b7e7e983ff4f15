package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the SQ8 decode kernel (functions/Sq8Decode.scala): the
  * codegen'd round trip must reproduce the superseded higher-order
  * column form (transform + element_at against the crossJoined stats
  * row) BIT-EXACTLY — same IEEE op order, one float rounding — because
  * q_ann_sq8's DuckDB oracle recomputes the decode in SQL and
  * hash-compares the resulting cosines, not just ids. The kernel
  * exists because Spark never whole-stage-codegens higher-order
  * functions: the old projection ran interpreted per element. */
class Sq8DecodeSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The superseded column formulation, kept verbatim as the equality
    * reference. */
  private def columnForm(d: org.apache.spark.sql.DataFrame) = {
    val stats = d.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("mins"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("maxs"))
    d.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        transform(col("embedding"), (v, i) => {
          val mn = element_at(col("mins"), i + 1)
          val mx = element_at(col("maxs"), i + 1)
          val code = least(floor((v.cast("double") - mn) * lit(255.0) / (mx - mn)), lit(255L))
          when(mx > mn, mn + code.cast("double") * (mx - mn) / lit(255.0))
            .otherwise(mn).cast("float")
        }).as("dq"))
  }

  private def kernelForm(d: org.apache.spark.sql.DataFrame) = {
    val statRows = d.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .collect().sortBy(_.getInt(0))
    d.select(col("vec_id"),
      graft.functions.Sq8Decode.sq8RoundTrip(col("embedding"),
        statRows.map(_.getDouble(1)).toSeq, statRows.map(_.getDouble(2)).toSeq).as("dq"))
  }

  test("kernel ≡ superseded column form on real embeddings (sf0.001, sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val d = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val k = kernelForm(d)
      val c = columnForm(d)
      assert(k.exceptAll(c).isEmpty && c.exceptAll(k).isEmpty,
        s"kernel decode != column decode at $dir")
      assert(k.count() > 0)
    }
  }

  test("constant dimension (mx == mn) decodes to mn; boundary codes clamp") {
    import spark.implicits._
    // dim 0 constant; dim 1 spans [-1, 3] with exact endpoints
    val d = Seq(
      (1L, Seq(2.5f, -1.0f)), (2L, Seq(2.5f, 3.0f)), (3L, Seq(2.5f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = kernelForm(d).orderBy("vec_id")
      .select("dq").as[Seq[Float]].collect()
    val ref = columnForm(d).orderBy("vec_id")
      .select("dq").as[Seq[Float]].collect()
    assert(got.toSeq == ref.toSeq, s"edge-case mismatch: $got vs $ref")
    assert(got.forall(_.head == 2.5f), "constant dim must decode to mn")
    assert(got(1)(1) == 3.0f, "max endpoint must round-trip exactly (code 255)")
  }

  test("a null element decodes like the column form, never garbage (ADVICE r13)") {
    // embeddings are non-null by corpus contract, but the input type
    // admits containsNull=true (parquet default) — the kernel must
    // match the superseded transform() form exactly. Measured column
    // semantics: least() SKIPS nulls, so in a spanning dim a null v
    // takes code 255 and decodes to ≈mx; in a constant dim the
    // otherwise(mn) branch never reads v and yields mn. Fixture:
    // dim 1 spans [2, 6]; dim 2 is constant after null removal.
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, Seq[java.lang.Float](1.0f, null, null)),
      org.apache.spark.sql.Row(2L, Seq[java.lang.Float](0.0f, 2.0f, 4.0f)),
      org.apache.spark.sql.Row(3L, Seq[java.lang.Float](2.0f, 6.0f, 4.0f)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    val d = spark.createDataFrame(rows, schema)
    // stats computed over the non-null slots only (posexplode skips nothing,
    // min/max ignore nulls) — both forms see identical mins/maxs
    val k = kernelForm(d).orderBy("vec_id").collect()
    val c = columnForm(d).orderBy("vec_id").collect()
    val kDq = k.map(_.getSeq[java.lang.Float](1))
    val cDq = c.map(_.getSeq[java.lang.Float](1))
    assert(kDq.toSeq == cDq.toSeq, s"null-slot decode mismatch: ${kDq.toSeq} vs ${cDq.toSeq}")
    assert(kDq(0)(1) == 6.0f, "null element in a spanning dim must decode as code 255 (≈mx)")
    assert(kDq(0)(2) == 4.0f, "null element in a constant dim must decode to mn")
    assert(kDq(0)(0) != null)
  }
}
