package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query and attribute wall-clock to Spark
  * stages. Usage: `runMain graft.Profile <query> [sfDir] [reps]`.
  *
  * Prints, per completed stage: task count, summed executor run time,
  * and the stage's callsite — enough to see which operator a slow
  * query's time actually lands in (the Spark UI is disabled in this
  * sandbox, so this is the headless stand-in). */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    require(SparkEntry.queries.contains(name), s"unknown query: $name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", GraftSession.scratchRoot)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = Option(si.taskMetrics).map(_.executorRunTime).getOrElse(0L)
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(0L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks, run, wall, si.details))
      }
    })
    (1 to reps).foreach { rep =>
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Materializer.clear()
      println(f"[prof] rep $rep: $name = $sec%.2f s")
      if (rep == reps) {
        import scala.jdk.CollectionConverters._
        println(f"[prof] ${"stage"}%-8s ${"tasks"}%5s ${"cpu_s"}%8s ${"wall_s"}%8s  name")
        val top = stages.asScala.toSeq.sortBy(-_._5)
        top.take(20).foreach {
          case (id, nm, nt, run, wall, _) =>
            println(f"[prof] $id%-8d $nt%5d ${run / 1e3}%8.2f ${wall / 1e3}%8.2f  $nm")
        }
        top.take(2).foreach { case (id, _, _, _, _, det) =>
          println(s"[prof] -- stage $id details --")
          det.linesIterator.take(18).foreach(l => println(s"[prof]   $l"))
        }
      }
    }
    spark.stop()
  }
}
