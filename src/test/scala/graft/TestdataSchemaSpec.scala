package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-testdata schema contract.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed physical encodings once (round 5: events.ts went from parquet
  * TIMESTAMP(NANOS) — surfaced as LongType under nanosAsLong — to
  * timestamp[us]/TIMESTAMP_NTZ), silently breaking 36 queries. This suite
  * makes any future drift ONE loud, named failure instead of dozens of
  * opaque analysis errors.
  *
  * Column TYPES are asserted loosely where the generator has legitimate
  * latitude (integer width, timestamp flavor); names and column sets are
  * asserted exactly.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def schemaOf(name: String): StructType =
    spark.read.parquet(s"$sf/$name.parquet").schema

  private def assertCols(table: String, expect: Map[String, DataType => Boolean]): Unit = {
    val s = schemaOf(table)
    val got = s.fields.map(_.name).toSet
    assert(got == expect.keySet,
      s"$table columns drifted: got ${got.toSeq.sorted.mkString(",")} " +
        s"expected ${expect.keySet.toSeq.sorted.mkString(",")}")
    expect.foreach { case (c, ok) =>
      assert(ok(s(c).dataType),
        s"$table.$c has unexpected type ${s(c).dataType}; testdata generator drifted — " +
          "update Tables.scala reader + this contract together")
    }
  }

  private val integral: DataType => Boolean =
    t => t == IntegerType || t == LongType
  private val anyTimestamp: DataType => Boolean =
    t => t == TimestampType || t == TimestampNTZType
  private def is(d: DataType): DataType => Boolean = _ == d

  test("region/nation dimension schemas") {
    assertCols("region", Map("r_regionkey" -> integral, "r_name" -> is(StringType)))
    assertCols("nation", Map(
      "n_nationkey" -> integral, "n_name" -> is(StringType), "n_regionkey" -> integral))
  }

  test("customer/supplier/part schemas") {
    assertCols("customer", Map(
      "c_custkey" -> integral, "c_name" -> is(StringType), "c_nationkey" -> integral,
      "c_acctbal" -> is(DoubleType), "c_mktsegment" -> is(StringType)))
    assertCols("supplier", Map(
      "s_suppkey" -> integral, "s_name" -> is(StringType), "s_nationkey" -> integral,
      "s_acctbal" -> is(DoubleType)))
    assertCols("part", Map(
      "p_partkey" -> integral, "p_name" -> is(StringType), "p_brand" -> is(StringType),
      "p_type" -> is(StringType), "p_size" -> integral, "p_retailprice" -> is(DoubleType)))
  }

  test("orders/lineitem fact schemas") {
    assertCols("orders", Map(
      "o_orderkey" -> integral, "o_custkey" -> integral, "o_orderstatus" -> is(StringType),
      "o_totalprice" -> is(DoubleType), "o_orderdate" -> anyTimestamp,
      "o_orderpriority" -> is(StringType)))
    assertCols("lineitem", Map(
      "l_orderkey" -> integral, "l_partkey" -> integral, "l_suppkey" -> integral,
      "l_linenumber" -> integral, "l_quantity" -> is(DoubleType),
      "l_extendedprice" -> is(DoubleType), "l_discount" -> is(DoubleType),
      "l_tax" -> is(DoubleType), "l_returnflag" -> is(StringType),
      "l_linestatus" -> is(StringType), "l_shipdate" -> anyTimestamp))
  }

  test("events schema — ts either-type contract (nanos-as-long OR timestamp micros)") {
    assertCols("events", Map(
      "event_id" -> integral,
      // The explicit contract Tables.events dispatches on. If this fails,
      // the generator shipped a THIRD encoding: extend Tables.events and
      // this predicate together.
      "ts" -> (t => t == LongType || t == TimestampType || t == TimestampNTZType),
      "user_id" -> integral, "event_type" -> is(StringType),
      "value" -> is(DoubleType), "props" -> is(StringType)))
    // And whatever the physical encoding, the reader must normalize it:
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType,
      "Tables.events must surface ts as session-local TimestampType")
  }

  test("documents/embeddings schemas") {
    assertCols("documents", Map(
      "doc_id" -> integral, "text" -> is(StringType), "lang" -> is(StringType),
      "source" -> is(StringType), "n_chars" -> integral))
    assertCols("embeddings", Map(
      "vec_id" -> integral,
      "embedding" -> {
        case ArrayType(FloatType, _) => true
        case ArrayType(DoubleType, _) => true
        case _ => false
      },
      "label" -> integral))
  }
}
