package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force models for the spatial grid family at sf0.001: the 3×3
  * cell cover must find EXACTLY the all-pairs within-radius set (the
  * property that makes the equi-join shape correct, not just fast),
  * kNN must match the exhaustive ranking, and the smoothed raster must
  * equal the windowed sum of its 3×3 neighborhood.
  */
class SpatialSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("spatial-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  /** Driver-side mirror of the md5 coordinate derivation. */
  private def coord(key: Long, axis: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md
      .digest(s"$key:$axis".getBytes("UTF-8"))
      .map(b => f"$b%02x")
      .mkString
    java.lang.Long.parseLong(hex.take(10), 16) % 100000L
  }

  private lazy val pts: Seq[(Long, Long, Long)] = graft.Tables
    .customer(spark, dir)
    .select("c_custkey")
    .collect()
    .map(_.getLong(0))
    .toSeq
    .map(k => (k, coord(k, "x"), coord(k, "y")))

  test("spatial_join: equals the brute-force all-pairs radius model") {
    val rows = SpatialQueries.spatialJoin(spark, dir).collect()
    val model = scala.collection.mutable.Map[Long, (Long, Long)]()
    for {
      (ka, xa, ya) <- pts
      (kb, xb, yb) <- pts
      if ka < kb
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 490000L
      k <- Seq(ka, kb)
    } {
      val (n, m) = model.getOrElse(k, (0L, Long.MaxValue))
      model(k) = (n + 1, math.min(m, d2))
    }
    assert(
      rows.map(r =>
        r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_neighbors"), r.getAs[Long]("min_d2")))).toMap == model.toMap)
  }

  test("neighbor pairs: half-neighborhood equals brute force on a dense corpus, all offsets exercised") {
    // the sf0.001 fixture yields only a couple of within-radius pairs,
    // which cannot distinguish the directed half-neighborhood from the
    // full 3×3 probe (the r15 rewrite) — a dense synthetic corpus
    // produces thousands of pairs spanning same-cell and every
    // cross-cell offset direction, and the pair SET must still equal
    // the all-pairs model exactly (no duplicate, no missing pair)
    import org.apache.spark.sql.functions._
    val n = 12000
    val keys = (1 to n).map(_.toLong)
    val tmp = java.nio.file.Files.createTempDirectory("spatial-spec").toString
    spark
      .createDataFrame(keys.map(Tuple1(_)))
      .toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = SpatialQueries
      .neighborPairs(spark, tmp)
      .collect()
      .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"), r.getAs[Long]("d2")))
    // exact-set equality: collect() yielding a duplicate pair would
    // differ from the model SET in size even if the distinct sets match
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    val xs = keys.map(k => coord(k, "x")).toArray
    val ys = keys.map(k => coord(k, "y")).toArray
    val model = (for {
      i <- (0 until n).iterator
      j <- (i + 1) until n
      d2 = (xs(i) - xs(j)) * (xs(i) - xs(j)) + (ys(i) - ys(j)) * (ys(i) - ys(j))
      if d2 <= 490000L
    } yield (keys(i), keys(j), d2)).toSet
    assert(got.toSet == model)
    // non-vacuity: enough pairs, and they straddle cells in several
    // relative directions (otherwise a broken diagonal offset could pass)
    assert(model.size > 1000, s"only ${model.size} pairs — corpus too sparse to exercise the cover")
    val deltas = got.map { case (a, b, _) =>
      val (ia, ib) = (a.toInt - 1, b.toInt - 1)
      ((xs(ib) / 1000L - xs(ia) / 1000L), (ys(ib) / 1000L - ys(ia) / 1000L))
    }.toSet
    assert(deltas.size >= 5, s"only cell offsets $deltas exercised")
  }

  test("spatial_knn: matches the exhaustive per-probe ranking") {
    val rows = SpatialQueries.spatialKnn(spark, dir).collect()
    val probes = graft.Tables
      .supplier(spark, dir)
      .select("s_suppkey")
      .collect()
      .map(_.getLong(0))
      .filter(_ <= 64)
      .map(k => (k, coord(k, "px"), coord(k, "py")))
    val model = probes.flatMap { case (p, px, py) =>
      pts
        .map { case (id, x, y) => (id, (px - x) * (px - x) + (py - y) * (py - y)) }
        .sortBy { case (id, d2) => (d2, id) }
        .take(5)
        .zipWithIndex
        .map { case ((id, d2), i) => (p, (i + 1).toLong, id, d2) }
    }.toSet
    assert(rows.map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("id"), r.getAs[Long]("d2"))).toSet == model)
  }

  test("dbscan: roles and clusters match a textbook driver-side DBSCAN") {
    val rows = SpatialQueries.dbscan(spark, dir).collect()
    val r2 = 490000L
    val ids = pts.map(_._1)
    val coords = pts.map(p => p._1 -> ((p._2, p._3))).toMap
    def d2(a: Long, b: Long): Long = {
      val ((xa, ya), (xb, yb)) = (coords(a), coords(b))
      (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
    }
    val neigh = ids.map(a => a -> ids.filter(b => b != a && d2(a, b) <= r2)).toMap
    val core = ids.filter(a => neigh(a).size >= 3).toSet
    // clusters = components over core-core adjacency, labeled by min id
    val cluster = scala.collection.mutable.Map.empty[Long, Long]
    for (c <- core.toSeq.sorted if !cluster.contains(c)) {
      var comp = Set(c); var frontier = Set(c)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(n => neigh(n).filter(core)).diff(comp)
        comp ++= frontier
      }
      val label = comp.min
      comp.foreach(cluster(_) = label)
    }
    val expect = ids.map { a =>
      if (core(a)) (a, "core", cluster(a))
      else {
        val coreNb = neigh(a).filter(core)
        if (coreNb.nonEmpty) {
          val best = coreNb.minBy(b => (d2(a, b), b))
          (a, "border", cluster(best))
        } else (a, "noise", -1L)
      }
    }.toSet
    assert(rows.map(r => (r.getAs[Long]("id"), r.getAs[String]("role"),
      r.getAs[Long]("cluster"))).toSet == expect)
    spark.catalog.clearCache()
  }

  test("geo_revenue: per-band counts match a driver model that exercises every band") {
    import org.apache.spark.sql.functions._
    // sf0.01, not the suite default: at sf0.001 every shipment lands in
    // 'remote' and the near/mid/far thresholds would go untested
    val d01 = "/root/testdata/sf0.01"
    val rows = SpatialQueries.geoRevenue(spark, d01).collect()
    val got = rows.map(r => r.getAs[String]("band") -> r.getAs[Long]("n_items")).toMap
    // driver model: coords via the md5 mirror, bands via the same thresholds
    val custC = graft.Tables.customer(spark, d01).select("c_custkey").collect()
      .map(_.getLong(0)).map(k => k -> ((coord(k, "x"), coord(k, "y")))).toMap
    val suppC = graft.Tables.supplier(spark, d01).select("s_suppkey").collect()
      .map(_.getLong(0)).map(k => k -> ((coord(k, "px"), coord(k, "py")))).toMap
    val custOf = graft.Tables.orders(spark, d01).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val model = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (r <- graft.Tables.lineitem(spark, d01).select("l_orderkey", "l_suppkey").collect()) {
      val (cx, cy) = custC(custOf(r.getLong(0)))
      val (sx, sy) = suppC(r.getLong(1))
      val d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
      val band =
        if (d2 <= 490000L / 4) "near"
        else if (d2 <= 490000L) "mid"
        else if (d2 <= 490000L * 4) "far"
        else "remote"
      model(band) += 1
    }
    assert(got == model.toMap, s"$got vs $model")
    // the dataset must actually exercise the inner bands, else this
    // test is vacuous — fail loudly if a data change degenerates it
    assert(Seq("near", "mid", "far").forall(model.contains),
      s"inner bands unexercised: $model")
    spark.catalog.clearCache()
  }

  test("grid_density: smoothed equals the 3×3 neighborhood sum; counts conserve points") {
    val rows = SpatialQueries.gridDensity(spark, dir).collect()
    val counts = pts
      .groupBy { case (_, x, y) => (x / 1000L, y / 1000L) }
      .view
      .mapValues(_.size.toLong)
      .toMap
    assert(rows.map(_.getAs[Long]("n")).sum == pts.size.toLong)
    for (r <- rows) {
      val (cx, cy) = (r.getAs[Long]("cx"), r.getAs[Long]("cy"))
      assert(counts(cx -> cy) == r.getAs[Long]("n"))
      val want = (for {
        dx <- -1L to 1L
        dy <- -1L to 1L
      } yield counts.getOrElse((cx + dx) -> (cy + dy), 0L)).sum
      assert(r.getAs[Long]("smoothed") == want)
    }
    assert(rows.length == counts.size)
  }
}
