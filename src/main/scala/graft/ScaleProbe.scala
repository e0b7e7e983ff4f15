package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic sf1 generator for the one-decade-up scale-slope probe
  * (VERDICT r7 #3 / r8 #5): deterministically replicate the driver's
  * sf0.1 tables ×10 so the slope table in BASELINE.md extends a decade
  * beyond the largest driver-provided SF. Writes to `target/sf1_synth/`
  * (inside the repo; never touches /root/testdata).
  *
  * Design — the replication must preserve each table's STATISTICAL
  * shape while scaling row counts linearly, or the probe measures a
  * different workload instead of a bigger one:
  *
  *  - **Key remapping, not key reuse.** Every scaled key column gets
  *    `key + rep * stride` where `stride = max(key)+1` from sf0.1 and
  *    `rep` is the replica index 0..9. Foreign keys remap with the SAME
  *    stride as their parent (l_orderkey with orders' stride, o_custkey
  *    with customer's), so join fan-in per key is IDENTICAL to sf0.1 —
  *    10 disjoint copies of the same join graph. Replica 0 is the
  *    original data unchanged.
  *  - **Dimensions don't scale.** nation/region copy through ×1 (TPC-H
  *    semantics: sf scales facts, not the 25-nation world). Customer/
  *    supplier nationkeys are untouched, so dim joins get ×10 fan-in —
  *    exactly what a real sf step does.
  *  - **Text perturbation, not text duplication.** documents.text gets
  *    a per-replica Caesar rotation (letters shifted by rep, via
  *    translate — codegen'd, no UDF). This preserves length, token
  *    boundaries, and within-replica dup/near-dup structure EXACTLY
  *    (each replica reproduces sf0.1's pair set under its own
  *    alphabet), while making cross-replica shingle overlap ~zero —
  *    near-dup pair counts scale exactly ×10. Ten verbatim copies
  *    would instead weld every doc into a 10-clone cluster and blow
  *    the pair count up ×45/doc: a DIFFERENT, degenerate workload.
  *  - **Embedding decorrelation by rotation.** embeddings.embedding is
  *    circularly shifted by rep positions (slice+concat — preserves
  *    the norm and the coordinate distribution exactly). Cross-replica
  *    cosines land near zero for these random-ish vectors, so ANN
  *    top-k / semantic near-dup don't degenerate into 10-way ties.
  *  - **Timestamps unchanged.** Event/order/shipdate densities go ×10
  *    per time window — that IS what a bigger corpus over the same
  *    period looks like; windowed aggregates see real ×10 group sizes.
  */
object ScaleProbe {
  private val REPS = 10

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase

  /** Per-replica Caesar rotation as a translate() CASE — deterministic,
    * length-preserving, codegen-friendly. rep 0 is identity. */
  private def caesar(text: org.apache.spark.sql.Column, rep: org.apache.spark.sql.Column) = {
    def rot(s: String, k: Int) = s.drop(k) + s.take(k)
    (1 until REPS).foldLeft(when(rep === 0, text)) { (acc, k) =>
      acc.when(rep === k, translate(text, lower + upper, rot(lower, k) + rot(upper, k)))
    }.otherwise(text)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/sf1_synth"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", GraftSession.scratchRoot)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synthesize(spark, srcDir, outDir)
    val counts = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      .map(n => s""""$n":${spark.read.parquet(s"$outDir/$n.parquet").count()}""")
    println(s"""{"metric":"sf1_synth_rows",${counts.mkString(",")},"out":"$outDir"}""")
    spark.stop()
  }

  /** Replicate every table of `srcDir` ×[[REPS]] into `outDir` (dims
    * copy through ×1); see the object doc for the fidelity contract. */
  def synthesize(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    def tbl(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")

    /** max(key)+1 — the remap stride that keeps replica key spaces disjoint. */
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val custS = stride(tbl("customer"), "c_custkey")
    val suppS = stride(tbl("supplier"), "s_suppkey")
    val partS = stride(tbl("part"), "p_partkey")
    val ordS  = stride(tbl("orders"), "o_orderkey")
    val evS   = stride(tbl("events"), "event_id")
    val userS = stride(tbl("events"), "user_id")
    val docS  = stride(tbl("documents"), "doc_id")
    val vecS  = stride(tbl("embeddings"), "vec_id")

    /** Cross-join with the replica index and remap the named long keys
      * by their parents' strides. crossJoin(range(10)) is a broadcast
      * NLJ against a 10-row side — linear scan, no shuffle. */
    def replicate(df: DataFrame, remap: (String, Long)*): DataFrame = {
      val reps = spark.range(REPS).toDF("rep")
      remap.foldLeft(df.crossJoin(broadcast(reps))) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("rep") * s)
      }
    }

    def write(df: DataFrame, name: String): Unit = {
      df.drop("rep").coalesce(4).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scaleprobe] wrote $name")
    }

    // dims copy through unscaled
    write(tbl("region").withColumn("rep", lit(0)), "region")
    write(tbl("nation").withColumn("rep", lit(0)), "nation")

    write(replicate(tbl("customer"), "c_custkey" -> custS), "customer")
    write(replicate(tbl("supplier"), "s_suppkey" -> suppS), "supplier")
    write(replicate(tbl("part"), "p_partkey" -> partS), "part")
    write(replicate(tbl("orders"), "o_orderkey" -> ordS, "o_custkey" -> custS), "orders")
    write(replicate(tbl("lineitem"),
      "l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS), "lineitem")
    write(replicate(tbl("events"), "event_id" -> evS, "user_id" -> userS), "events")
    write(replicate(tbl("documents"), "doc_id" -> docS)
      .withColumn("text", caesar(col("text"), col("rep"))), "documents")
    write(replicate(tbl("embeddings"), "vec_id" -> vecS)
      .withColumn("embedding",
        // circular shift by rep: norm-preserving, decorrelates replicas
        concat(slice(col("embedding"), col("rep") + 1,
                     size(col("embedding")) - col("rep")),
               slice(col("embedding"), lit(1), col("rep")))), "embeddings")
  }
}
