package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-reader paths, so the first
    // timed query doesn't absorb one-time JVM costs
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // optional args = subset of query names (driver passes none)
    val subset = SparkEntry.queries.toSeq
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    val results = subset.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failure is a FAILURE, never a fast time: surface the stack, emit
      // a negative sentinel in the JSON, and exit nonzero at the end
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e) }
      val sec = (System.nanoTime() - t0) / 1e9
      Materializer.clear() // per-query scope: no state leaks into the next
      err match {
        case Some(e) =>
          System.err.println(f"[bench] $name%-28s FAILED after $sec%8.2f s")
          e.printStackTrace()
          name -> -1.0
        case None =>
          System.err.println(f"[bench] $name%-28s $sec%8.2f s")
          name -> sec
      }
    }
    val failed = results.collect { case (n, v) if v < 0 => n }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
