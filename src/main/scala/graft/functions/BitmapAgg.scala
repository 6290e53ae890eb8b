package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Paged bitmap over the full signed-long domain — the Roaring-style
  * summary every distinct-count-heavy OLAP engine (Druid, ClickHouse,
  * Doris) keys its exact `COUNT(DISTINCT)` rollups on. The domain is
  * split into 4096-bit pages (page id = value >> 12); only touched pages
  * are materialized, and serialization stores only the non-zero words of
  * each page behind a 64-bit presence mask, so sparse id sets cost a few
  * bytes per element while dense ranges converge to 1 bit per element.
  *
  * Why this exists when Spark has `count(DISTINCT x)`: the built-in is
  * exact but not MERGEABLE — a per-day distinct count cannot be rolled up
  * to a month without re-scanning the fact table, which is precisely what
  * a 100 TB pipeline cannot afford. A bitmap is an exact, unioniable
  * summary: build per day once, OR the summaries for any ad-hoc window.
  * (HLL/KMV in [[graft.queries.SketchQueries]] are the approximate
  * cousins; this is the exact tier for bounded id domains like user ids.)
  */
final class PagedBitmap {
  import PagedBitmap._

  /** pageId -> 64-word (4096-bit) bitmap; only touched pages exist. */
  val pages: mutable.LongMap[Array[Long]] = mutable.LongMap.empty

  def add(v: Long): Unit = {
    val page = pages.getOrElseUpdate(v >> PageBits, new Array[Long](WordsPerPage))
    val idx = (v & PageMask).toInt
    page(idx >>> 6) |= 1L << (idx & 63)
  }

  def contains(v: Long): Boolean =
    pages.get(v >> PageBits).exists { page =>
      val idx = (v & PageMask).toInt
      (page(idx >>> 6) & (1L << (idx & 63))) != 0
    }

  /** In-place union. */
  def or(other: PagedBitmap): Unit =
    other.pages.foreach { case (pid, theirs) =>
      pages.get(pid) match {
        case Some(mine) =>
          var w = 0
          while (w < WordsPerPage) { mine(w) |= theirs(w); w += 1 }
        case None => pages.update(pid, theirs.clone())
      }
    }

  def cardinality: Long = {
    var n = 0L
    pages.foreach { case (_, page) =>
      var w = 0
      while (w < WordsPerPage) { n += java.lang.Long.bitCount(page(w)); w += 1 }
    }
    n
  }

  /** `[nPages:int][pageId:long, presentMask:long, nonZeroWords:long*]*` —
    * pages sorted by id so equal bitmaps serialize byte-identically.
    */
  def toBytes: Array[Byte] = {
    val pids = pages.keys.toArray.sorted
    var size = 4 + pids.length * 16
    pids.foreach { pid =>
      val page = pages(pid)
      var w = 0
      while (w < WordsPerPage) { if (page(w) != 0) size += 8; w += 1 }
    }
    val buf = ByteBuffer.allocate(size)
    buf.putInt(pids.length)
    pids.foreach { pid =>
      val page = pages(pid)
      var mask = 0L
      var w = 0
      while (w < WordsPerPage) { if (page(w) != 0) mask |= 1L << w; w += 1 }
      buf.putLong(pid).putLong(mask)
      w = 0
      while (w < WordsPerPage) { if (page(w) != 0) buf.putLong(page(w)); w += 1 }
    }
    buf.array()
  }
}

object PagedBitmap {
  /** 2^12 bits = 4096 ids per page; 64 words of 64 bits. */
  final val PageBits = 12
  final val PageMask = (1L << PageBits) - 1
  final val WordsPerPage = 1 << (PageBits - 6)

  def fromBytes(bytes: Array[Byte]): PagedBitmap = {
    val bm = new PagedBitmap
    val buf = ByteBuffer.wrap(bytes)
    val nPages = buf.getInt
    var p = 0
    while (p < nPages) {
      val pid = buf.getLong
      val mask = buf.getLong
      val page = new Array[Long](WordsPerPage)
      var w = 0
      while (w < WordsPerPage) {
        if ((mask & (1L << w)) != 0) page(w) = buf.getLong
        w += 1
      }
      bm.pages.update(pid, page)
      p += 1
    }
    bm
  }
}

/** Shared TypedImperativeAggregate plumbing for the bitmap family.
  * TypedImperativeAggregate is the Catalyst tier for object-buffer
  * aggregates: Spark plans it as ObjectHashAggregateExec with map-side
  * partial aggregation, serializing the buffer ([[PagedBitmap.toBytes]])
  * only at the shuffle boundary — exactly the partial-OR / final-OR
  * execution a distributed bitmap rollup needs.
  */
sealed abstract class BitmapAggBase
    extends TypedImperativeAggregate[PagedBitmap]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): PagedBitmap = new PagedBitmap
  override def merge(b: PagedBitmap, o: PagedBitmap): PagedBitmap = { b.or(o); b }
  override def serialize(b: PagedBitmap): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): PagedBitmap = PagedBitmap.fromBytes(bytes)
  override def nullable: Boolean = false

  /** Integral id columns only (int is widened in [[addTo]]). */
  protected def checkIdInput(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT or INT id column, got ${other.catalogString}")
  }

  protected final def addTo(b: PagedBitmap, row: InternalRow): PagedBitmap = {
    child.eval(row) match {
      case null => ()
      case l: java.lang.Long => b.add(l)
      case i: java.lang.Integer => b.add(i.toLong)
      case other => throw new IllegalStateException(s"unexpected id value $other")
    }
    b
  }
}

/** `bitmap_build(id)` → binary: the serialized exact-distinct summary of a
  * long id column. Store per (dimension, day); OR the bytes later for any
  * rollup window — no fact re-scan.
  */
case class BitmapBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BitmapAggBase {
  override def checkInputDataTypes(): TypeCheckResult = checkIdInput()
  override def dataType: DataType = BinaryType
  override def update(b: PagedBitmap, row: InternalRow): PagedBitmap = addTo(b, row)
  override def eval(b: PagedBitmap): Any = b.toBytes
  override def withNewMutableAggBufferOffset(o: Int): BitmapBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapBuild = copy(child = c)
  override def prettyName: String = "bitmap_build"
}

/** `bitmap_distinct(id)` → bigint: exact distinct count of a long id
  * column in ONE aggregation pass — no Expand, no two-phase
  * distinct-key shuffle; partials merge by bitmap OR.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BitmapAggBase {
  override def checkInputDataTypes(): TypeCheckResult = checkIdInput()
  override def dataType: DataType = LongType
  override def update(b: PagedBitmap, row: InternalRow): PagedBitmap = addTo(b, row)
  override def eval(b: PagedBitmap): Any = b.cardinality
  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapDistinct = copy(child = c)
  override def prettyName: String = "bitmap_distinct"
}

/** `bitmap_merge_count(bytes)` → bigint: OR pre-built bitmap summaries
  * (from [[BitmapBuild]]) and report the exact distinct count of the
  * union — the rollup leg that never touches the fact table.
  */
case class BitmapMergeCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BitmapAggBase {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY bitmap_build output, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def update(b: PagedBitmap, row: InternalRow): PagedBitmap = {
    val v = child.eval(row)
    if (v != null) b.or(PagedBitmap.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def eval(b: PagedBitmap): Any = b.cardinality
  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapMergeCount = copy(child = c)
  override def prettyName: String = "bitmap_merge_count"
}

object BitmapAgg {

  private def one(name: String, usage: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(getClass.getName, null, name, usage, ""), builder)

  private def unary(name: String, f: Expression => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 1)
        throw new IllegalArgumentException(s"$name requires exactly 1 argument, got ${exprs.length}")
      f(exprs.head)
    }

  /** The (identifier, info, builder) triples for SparkSessionExtensions
    * injection — shared with [[graft.plans.GraftExtensions]].
    */
  def registrations: Seq[
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    one(
      "bitmap_build",
      "bitmap_build(id) - serialized exact-distinct bitmap summary of a long id column",
      unary("bitmap_build", BitmapBuild(_))),
    one(
      "bitmap_distinct",
      "bitmap_distinct(id) - exact distinct count via a mergeable paged bitmap",
      unary("bitmap_distinct", BitmapDistinct(_))),
    one(
      "bitmap_merge_count",
      "bitmap_merge_count(bytes) - exact distinct count of the union of bitmap_build summaries",
      unary("bitmap_merge_count", BitmapMergeCount(_))))

  /** Per-session registration for embedded use (the extensions class
    * registers the same triples at session build time).
    */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
