package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NamedExpression,
  RowOrdering, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a WHOLE-OPERATOR Catalyst extension (SURVEY §2.11 tier
  * (c)): a custom `LogicalPlan` node, planned by a custom `SparkStrategy`
  * into a custom `SparkPlan` that merge-scans co-partitioned sorted
  * children — the preference-order step beyond composed operators
  * (`RelationalQueries.asofJoin` keeps the union+window composition as
  * the portable baseline; both hash-match the same DuckDB `ASOF LEFT
  * JOIN` oracle).
  *
  * Semantics (matching DuckDB `l ASOF LEFT JOIN r ON l.k = r.k AND
  * l.ts >= r.ts`): for each left row, attach the right row with equal
  * keys and the greatest `rightTs <= leftTs`; left rows with no match
  * keep null right columns; null keys never match (SQL equality).
  *
  * Scale design: both children hash-shuffle on the JOIN KEYS ONLY (the
  * same two exchanges a sort-merge equi-join would pay — at 100 TB the
  * planner inserts them, or bucketed tables satisfy them for free) and
  * each partition is then a single linear merge with O(1) state: one
  * lookahead row and one candidate row — no per-key right-side buffering,
  * no union row blow-up, no window machinery. AQE still re-plans the
  * exchanges (skew split, partition coalescing) because the node only
  * declares `ClusteredDistribution` requirements like any built-in join.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of merge join. Children arrive hash-clustered on the keys
  * and sorted by (keys, ts) — `EnsureRequirements` inserts the exchanges
  * and sorts exactly as it does for `SortMergeJoinExec`.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val rWidth = rOut.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd projections/orderings are per-partition (not serializable)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      // downstream operators (and collect itself) expect UnsafeRow output
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        // last right row with key == current left key and rTs <= lTs;
        // O(1) state — the whole point of the merge formulation
        private var candidate: InternalRow = null
        private var candidateKey: InternalRow = null

        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        def hasNext: Boolean = lIter.hasNext

        def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTsRow = lTsProj(lRow).copy() // rTsProj below reuses its buffer per call
          if (lKey.anyNull || lTsRow.isNullAt(0)) {
            // SQL semantics: null keys never equal, and `lTs >= rTs` is
            // never true for null lTs — no match, and no right-side
            // consumption (later same-key left rows may still need rHead)
            outProj(joined(lRow, nullRight))
          } else {
            if (candidate != null && keyOrd.compare(candidateKey, lKey) != 0) {
              candidate = null
              candidateKey = null
            }
            var done = false
            while (!done && rHead != null) {
              val rKey = rKeyProj(rHead)
              if (rKey.anyNull) advanceRight()
              else {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) advanceRight()
                else if (c == 0) {
                  val rTsRow = rTsProj(rHead)
                  // null rTs sorts first within the key (NULLS FIRST) and
                  // never satisfies `lTs >= rTs` — skip, don't latch
                  if (rTsRow.isNullAt(0)) advanceRight()
                  else if (tsOrd.compare(rTsRow, lTsRow) <= 0) {
                    candidate = rHead.copy()
                    candidateKey = lKey.copy()
                    advanceRight()
                  } else done = true
                } else done = true
              }
            }
            outProj(joined(lRow, if (candidate != null) candidate else nullRight))
          }
        }
      }
    }
  }
}

/** Planner strategy: one custom logical node → one custom exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public builder for the custom as-of join. */
object AsOfJoin {

  /** Idempotently add the planner strategy to the session (the
    * [[GraftExtensions]] entry point injects it at session build time for
    * cluster deployments; this is the embedded-use path).
    */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsOfJoinStrategy

  /** `left ASOF LEFT JOIN right ON keys equal AND leftTs >= rightTs`.
    * Column names must be disjoint (rename the right side first — also
    * what keeps the output unambiguous); key column types must match
    * pairwise. The right side is re-aliased internally so self-join
    * lineage (both inputs deriving from one table) gets fresh
    * attribute ids.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    // ambiguity is an error, as DataFrame.col would make it: resolution
    // below is find-by-name, so internally duplicated names (legal after
    // a Spark join) must not silently bind to the first occurrence
    val spark = left.sparkSession
    // honor the session's name-resolution mode (case-insensitive by
    // default): a case-sensitive duplicate/disjointness check would
    // reject 'Ts' for leftTs="ts" yet wave through left 'id' vs right
    // 'ID' — producing exactly the downstream ambiguity the require
    // exists to prevent
    val resolver = spark.sessionState.conf.resolver
    def canon(names: Seq[String]): Seq[String] =
      if (spark.sessionState.conf.caseSensitiveAnalysis) names
      else names.map(_.toLowerCase(java.util.Locale.ROOT))
    require(
      canon(left.columns).distinct.length == left.columns.length,
      s"left side has duplicate column names: ${left.columns.mkString(", ")}")
    require(
      canon(right.columns).distinct.length == right.columns.length,
      s"right side has duplicate column names: ${right.columns.mkString(", ")}")
    require(
      canon(left.columns).toSet.intersect(canon(right.columns).toSet).isEmpty,
      s"as-of join requires disjoint column names; both sides have " +
        s"${canon(left.columns).toSet.intersect(canon(right.columns).toSet).mkString(", ")}")
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases: Seq[NamedExpression] =
      rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found among ${out.map(_.name).mkString(", ")}"))
    val lk = leftKeys.map(attr(lPlan.output, _))
    val rk = rightKeys.map(attr(rPlan.output, _))
    require(
      lk.map(_.dataType) == rk.map(_.dataType),
      s"as-of key types must match: ${lk.map(_.dataType)} vs ${rk.map(_.dataType)}")
    val lt = attr(lPlan.output, leftTs)
    val rt = attr(rPlan.output, rightTs)
    require(
      lt.dataType == rt.dataType,
      s"as-of timestamp types must match: ${lt.dataType} vs ${rt.dataType}")
    org.apache.spark.sql.graft.Bridge.ofRows(
      spark,
      AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt))
  }
}
