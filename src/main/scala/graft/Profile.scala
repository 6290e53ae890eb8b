package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Optimization-round measurement helper (guide §1): run one query and
  * print every Spark job's wall time, so a multi-job iterative query's
  * wall can be attributed to its rounds instead of guessed at.
  *
  * Usage: runMain graft.Profile <query> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-profile", cpus)
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        // js.properties can be NULL for some job submissions (ADVICE r16);
        // an NPE here is swallowed by the listener bus and silently drops
        // the job's row from the profile
        starts(js.jobId) =
          (js.time, Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, desc) =>
          rows += ((je.jobId, (je.time - t0) / 1e3, desc))
        }
    })
    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      rows.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.queries.DedupQueries.clearClusterMemo(spark)
      Thread.sleep(200) // let listener events drain
      println(f"== $name rep $r: wall $dt%.3f s, ${rows.size} jobs, " +
        f"job-sum ${rows.map(_._2).sum}%.3f s")
      rows.sortBy(_._1).foreach { case (id, sec, desc) =>
        println(f"  job $id%3d  $sec%7.3f s  $desc")
      }
    }
    spark.stop()
  }
}
