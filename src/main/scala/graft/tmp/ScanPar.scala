package graft.tmp

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** r16 scratch probe (NOT part of the library; deleted before round end):
  * how much does post-scan repartitioning buy when the input is one
  * unsplittable parquet row group?
  */
object ScanPar {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-scanpar", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(tag: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    }
    // gram explode over documents: the scan-fused map shape many text
    // queries share
    time("grams direct      ") {
      Tables.documents(spark, dir)
        .select(explode(expr(
          "transform(sequence(1, size(split(text, ' ')) - 2), i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")).as("g"))
        .groupBy(col("g")).agg(count(lit(1))).count()
    }
    time("grams repartition ") {
      Tables.documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)
        .select(explode(expr(
          "transform(sequence(1, size(split(text, ' ')) - 2), i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")).as("g"))
        .groupBy(col("g")).agg(count(lit(1))).count()
    }
    // lineitem wide aggregate: the relational scan shape
    time("li agg direct     ") {
      Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey")).agg(sum(col("l_extendedprice")), countDistinct(col("l_partkey"))).count()
    }
    time("li agg repartition") {
      Tables.lineitem(spark, dir).repartition(spark.sparkContext.defaultParallelism)
        .groupBy(col("l_orderkey")).agg(sum(col("l_extendedprice")), countDistinct(col("l_partkey"))).count()
    }
    spark.stop()
  }
}
