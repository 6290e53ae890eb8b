package graft.queries
object SjPlan {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("sj-plan", "8")
    val df = graft.SparkEntry.queries("q_spatial_join")(s, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println("=== customer scans: " + "customer\\.parquet".r.findAllIn(p).size)
    println("=== joins: " + "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r.findAllIn(p).size)
    println("=== reused: " + "ReusedExchange".r.findAllIn(p).size)
    s.stop()
  }
}
