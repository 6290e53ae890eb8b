package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks [[ZOrderKey]]: the codegen'd expression agrees with an
  * independent bit-by-bit model, the interpreted path agrees with
  * codegen, and the layout property the operator exists for holds —
  * a top-level curve bucket bounds BOTH dimensions.
  */
class ZOrderKeySpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("zorder-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Independent model: place bit i of a at position 2i, of b at 2i+1. */
  private def model(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))
    }

  test("interleave agrees with the bit-position model (incl. edges)") {
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (0xffffL, 0L), (0L, 0xffffL),
      (0xffffL, 0xffffL), (0x1234L, 0xabcdL), (65536L, 65536L), // wraps to 0
      (-1L, -1L)) // masked to 0xffff
    val rnd = new scala.util.Random(7)
    val all = cases ++ Seq.fill(500)((rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536))
    for ((a, b) <- all)
      assert(ZOrderKey.interleave(a, b) === model(a & 0xffffL, b & 0xffffL), s"($a,$b)")
  }

  test("SQL surface: codegen and interpreted paths agree with the Scala kernel") {
    ZOrderKey.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.toDF("a", "b")
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val got = df.select(col("a"), col("b"), expr("z_order_key(a, b)").as("z")).collect()
      got.foreach { r =>
        assert(r.getLong(2) === ZOrderKey.interleave(r.getLong(0), r.getLong(1)))
      }
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("N-dim interleave agrees with the bit-position model; codegen == interpreted (3 and 4 dims)") {
    // independent model: bit i of dim d at position i*n + d
    def modelN(vals: Array[Long]): Long = {
      val n = vals.length
      var r = 0L
      for (d <- 0 until n; i <- 0 until 16)
        r |= (((vals(d) & 0xffffL) >> i) & 1L) << (i * n + d)
      r
    }
    val rnd = new scala.util.Random(13)
    for (n <- Seq(3, 4)) {
      val edge = Seq(
        Array.fill(n)(0L), Array.fill(n)(0xffffL),
        Array.tabulate(n)(d => if (d == 0) 0xffffL else 0L),
        Array.tabulate(n)(d => if (d == n - 1) 0xffffL else 0L))
      val all = edge ++ Seq.fill(300)(Array.fill(n)(rnd.nextLong().abs % 65536))
      all.foreach { vals =>
        assert(ZOrderKey.interleaveN(vals) === modelN(vals), vals.mkString(","))
      }
    }
    // SQL surface, both execution paths
    ZOrderKey.register(spark)
    import spark.implicits._
    val rows = Seq.fill(500)((
      rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.toDF("a", "b", "c", "d")
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      df.select(col("a"), col("b"), col("c"), col("d"),
        expr("z_order_key(a, b, c)").as("z3"),
        expr("z_order_key(a, b, c, d)").as("z4")).collect().foreach { r =>
        assert(r.getLong(4) ===
          ZOrderKey.interleaveN(Array(r.getLong(0), r.getLong(1), r.getLong(2))), "z3")
        assert(r.getLong(5) ===
          ZOrderKey.interleaveN(Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))), "z4")
      }
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // nulls propagate
    val withNull = spark.sql("SELECT z_order_key(1L, 2L, CAST(NULL AS BIGINT)) AS z").collect()
    assert(withNull.head.isNullAt(0))
    // wrong arity still raises the analysis error
    val err = intercept[Exception](spark.sql("SELECT z_order_key(1L)").collect())
    assert(err.getMessage.contains("requires"), err.getMessage)
  }

  test("layout write path: repartitionByRange(z) bounds BOTH dims per partition") {
    // the claim the audit query documents, proven on the actual write
    // shape: files ≙ range partitions of the z key; their per-file
    // min/max rectangles must cover far less area than the global
    // bounding box, which is exactly what makes min/max stats prune
    ZOrderKey.register(spark)
    import org.apache.spark.sql.functions._
    val df = graft.Tables
      .lineitem(spark, "/root/testdata/sf0.001")
      .select(
        (col("l_orderkey") % 65536).cast("long").as("p"),
        (col("l_partkey") % 65536).cast("long").as("s"))
      .withColumn("z", expr("z_order_key(p, s)"))
    val stats = df
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions(col("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg(
        min(col("p")).as("pmin"), max(col("p")).as("pmax"),
        min(col("s")).as("smin"), max(col("s")).as("smax"),
        min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      .collect()
    assert(stats.length > 1)
    // z ranges are disjoint across partitions (the write is clusterable)
    val zr = stats.map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax"))).sortBy(_._1)
    zr.sliding(2).foreach { case Array((_, hi), (lo2, _)) => assert(hi <= lo2) }
    // and the per-partition rectangles cover much less than the global box
    def area(r: (Long, Long, Long, Long)): Double =
      (r._2 - r._1 + 1).toDouble * (r._4 - r._3 + 1).toDouble
    val boxes = stats.map(r => (r.getAs[Long]("pmin"), r.getAs[Long]("pmax"),
      r.getAs[Long]("smin"), r.getAs[Long]("smax")))
    val global = (boxes.map(_._1).min, boxes.map(_._2).max,
      boxes.map(_._3).min, boxes.map(_._4).max)
    val avgArea = boxes.map(area).sum / boxes.length
    assert(avgArea < 0.5 * area(global),
      s"z-clustered partitions must localize: avg ${avgArea} vs global ${area(global)}")
  }

  test("layout property: every top-level bucket spans < 2^10 on BOTH axes") {
    val rows = graft.queries.RelationalQueries
      .zorderLayout(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pSpan = r.getAs[Long]("p_max") - r.getAs[Long]("p_min")
      val sSpan = r.getAs[Long]("s_max") - r.getAs[Long]("s_min")
      // bucket = top 12 interleaved bits = top 6 bits of each dimension
      assert(pSpan < 1024 && sSpan < 1024,
        s"bucket ${r.getAs[Long]("bucket")}: spans $pSpan/$sSpan")
    }
  }
}
