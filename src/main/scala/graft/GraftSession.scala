package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CountMinSketchAgg, DotProductF, PolyHashExpr, ShingleHashesExpr, StopCountExpr, TokenCountExpr, TokenHashesExpr}

/** Library entry points: SQL function registration + a session builder
  * with the engine's recommended configuration.
  *
  * [[GraftExtensions]] makes the custom Catalyst expressions callable
  * from SQL (`SELECT dot_f(a, b)`, `poly_hash(text)`, …) in any session
  * created with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, the standard
  * plugin mechanism — no code changes to the application. The same
  * registrations are applied directly by [[GraftSession.builder]] for
  * programmatic use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  /** (name, info, builder) for every custom expression in the library. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_f",
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (es: Seq[Expression]) => DotProductF(es(0), es(1))),
    ("poly_hash",
      new ExpressionInfo(classOf[PolyHashExpr].getName, "poly_hash"),
      (es: Seq[Expression]) => PolyHashExpr(es.head)),
    ("token_hashes",
      new ExpressionInfo(classOf[TokenHashesExpr].getName, "token_hashes"),
      (es: Seq[Expression]) => TokenHashesExpr(es.head)),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      (es: Seq[Expression]) => ShingleHashesExpr(es.head)),
    ("cms_sketch",
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "cms_sketch"),
      (es: Seq[Expression]) => CountMinSketchAgg(es.head).toAggregateExpression()),
    ("token_count",
      new ExpressionInfo(classOf[TokenCountExpr].getName, "token_count"),
      (es: Seq[Expression]) => TokenCountExpr(es.head)),
    // stop_count(text, 'w1', 'w2', ...) — trailing args must be string
    // literals (the word set is folded into the expression instance)
    ("stop_count",
      new ExpressionInfo(classOf[StopCountExpr].getName, "stop_count"),
      (es: Seq[Expression]) => StopCountExpr(es.head, es.tail.map { e =>
        require(e.foldable &&
          e.dataType == org.apache.spark.sql.types.StringType,
          "stop_count words must be string literals")
        val v = e.eval(null)
        require(v != null, "stop_count words must be non-null string literals")
        v.toString
      })))
}

object GraftSession {
  /** Register the function surface on an already-running session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.Bridge.registerFunctions(spark, GraftExtensions.functions)

  /** RAM-backed scratch root for shuffle + materialization temp files.
    *
    * Local-mode shuffle spills land under `spark.local.dir` (default
    * /tmp). On this sandbox /tmp is a virtio ext4 disk with multi-second
    * write-latency bursts: thread dumps of slow bench runs show executor
    * threads pinned in BypassMergeSortShuffleWriter/copyFileStreamNIO
    * while 20-30 s lands on whichever query is mid-shuffle — pure
    * environment noise that moved between queries run to run. A real
    * cluster serves shuffle from fast local SSDs; tmpfs (/dev/shm,
    * 126 GiB here) is the local-mode stand-in with that cost model.
    * Falls back to the JVM temp dir when no writable tmpfs exists.
    * Everything written here is session-scoped temp state (Spark's own
    * spark-/blockmgr- dirs and [[Materializer]]'s tagged copies), all
    * removed by their owners' shutdown hooks. */
  lazy val scratchRoot: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val root =
      if (java.nio.file.Files.isWritable(shm)) shm.resolve("graft-scratch")
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createDirectories(root)
    root.toString
  }

  /** Builder preloaded with the engine's recommended configuration.
    * `cores` sizes local parallelism AND shuffle partitions — on a real
    * cluster pass shufflePartitions ≈ 2-3× total executor cores instead
    * and drop the master override. */
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", scratchRoot)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // events.parquet carries TIMESTAMP(NANOS) — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session for tests/tools. */
  def local(cores: Int): SparkSession =
    builder(cores).master(s"local[$cores]").getOrCreate()
}
