package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf

/** Whole-operator extension path (SURVEY §7.3 preference (c)): a custom
  * logical plan node + planner Strategy + physical operators for the
  * as-of join — an operator Spark's built-in join set lacks
  * (the reference engine lacks it too; q103 implements the same
  * semantics compositionally via a union + cumulative window).
  *
  * Semantics: LEFT OUTER as-of — for every left row, ONE right row with
  * the same key, chosen by `direction` (pandas merge_asof's axis):
  *  - "backward": greatest right time <= left time; ties on time
  *    resolve to the GREATEST tie-break (last hit scanning backward);
  *  - "forward": smallest right time >= left time; ties resolve to the
  *    SMALLEST tie-break (first hit scanning forward);
  *  - "nearest": the closer of the two by |Δtime|, backward preferred
  *    on equal distance.
  * An optional `tolerance` (same unit as the time columns) rejects
  * matches with |Δtime| > tolerance — pandas merge_asof's knob for
  * "a quote is only valid for N seconds".
  * `joinType` picks what happens to unmatched left rows: "outer"
  * (default, pandas parity) pads the right side with nulls; "inner"
  * DROPS them inside the operator — native semantics rather than a
  * post-filter on the padded output, which would also poison the
  * matched-rows SQLMetric; "anti" emits ONLY the unmatched left rows,
  * left columns only ("which facts have no reference observation
  * as-of their time" — the audit query for every as-of pipeline).
  *
  * Three physical shapes, chosen by the planner on right-side size
  * (the same ladder Spark's JoinSelection walks for equi-joins):
  *  - [[BroadcastAsOfJoinExec]] — right side under the broadcast
  *    threshold rides Spark's own BroadcastExchange; the streamed left
  *    side probes a per-key time-sorted index by binary search. NO
  *    shuffle of the big side: the 100 TB fact-to-reference-series
  *    shape (prices, dimensions-as-of, config history).
  *  - [[ShuffledAsOfJoinExec]] — both sides hash-clustered on the key
  *    (EnsureRequirements co-partitions them); each task indexes its
  *    right partition and streams its left partition. Covers
  *    right-side-too-big-to-broadcast with one shuffle per side,
  *    analogous to ShuffledHashJoinExec.
  *  - [[SortMergeAsOfJoinExec]] — both sides clustered AND sorted
  *    (Spark's spill-capable SortExec); the merge keeps one candidate
  *    row per key group. The skew-complete shape: a hot key that would
  *    OOM the hash index streams through in O(1) memory, analogous to
  *    SortMergeJoinExec.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    direction: String = "backward",
    tolerance: Long = Long.MaxValue,
    joinType: String = "outer") extends BinaryNode {

  override def output: Seq[Attribute] =
    AsOfCore.outputFor(joinType, left.output, right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Shared build/probe core: a per-key time-sorted array index of the
  * right side (times ascending, ties by tie-break ascending — the probe
  * takes the LAST qualifying slot, so ties resolve to the max tie-break,
  * matching q103's window formulation and DuckDB's ASOF JOIN), probed by
  * rightmost-<=-binary-search. Key and time/tie-break expressions must
  * evaluate to null-safe hashable keys and Long-valued times. */
private[plans] object AsOfCore {
  type Index = java.util.HashMap[Any, (Array[Long], Array[InternalRow])]

  /** Time/tie-break values are validated Long-backed or Int-backed at
    * plan build (AsOfJoinOps.asof) — normalize both to Long. */
  def toLongTime(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }

  /** Output schema per join type: OUTER null-pads the right side (so
    * its attributes turn nullable), INNER keeps both sides' original
    * nullability (no pad row can appear), ANTI emits the left side
    * only — the standard anti-join shape ("which fact rows have NO
    * reference observation as-of their time"). */
  def outputFor(joinType: String, left: Seq[Attribute],
                right: Seq[Attribute]): Seq[Attribute] = joinType match {
    case "anti" => left
    case "inner" => left ++ right
    case _ => left ++ right.map(_.withNullability(true))
  }

  /** Key evaluator for the HASH-index paths. Single (atomic) keys
    * evaluate directly — UTF8String/boxed-primitive equality makes
    * them valid HashMap keys. A multi-column (struct) key evaluates
    * through an UnsafeProjection over its FIELDS: UnsafeRow equality
    * is byte-wise (GenericInternalRow has no value equality, so a raw
    * struct eval would silently never match), and a row with ANY null
    * field maps to null = no match — SQL equality semantics, same as
    * a null atomic key. `copyKeys` must be true when the evaluator's
    * results outlive the call (index build): the projection reuses
    * its buffer. */
  def keyEvaluator(key: Expression, schema: Seq[Attribute],
                   copyKeys: Boolean): InternalRow => Any =
    key.dataType match {
      case st: org.apache.spark.sql.types.StructType =>
        // project the key's FIELD expressions directly (projecting
        // GetStructField over the struct would rebuild the struct once
        // per field); asofBy always passes a CreateNamedStruct of
        // attributes, the fallback covers any other struct-typed key
        val fieldExprs = key match {
          case cns: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
            cns.valExprs
          case _ => st.fields.indices.map(i =>
            org.apache.spark.sql.catalyst.expressions.GetStructField(key, i))
        }
        val proj = UnsafeProjection.create(
          fieldExprs.map(BindReferences.bindReference(_, schema)))
        row => {
          val r = proj(row)
          if (r.anyNull) null
          else if (copyKeys) r.copy() else r
        }
      case _ =>
        val bound = BindReferences.bindReference(key, schema)
        row => bound.eval(row)
    }

  /** Null-key test that matches keyEvaluator's semantics on the
    * SORT-MERGE path, where keys stay as raw struct rows for the
    * interpreted ordering: an atomic null, or any null FIELD of a
    * multi-column key, means "matches nothing". */
  def keyIsNull(dt: org.apache.spark.sql.types.DataType, v: Any): Boolean =
    v == null || (dt.isInstanceOf[org.apache.spark.sql.types.StructType] &&
      v.asInstanceOf[InternalRow].anyNull)

  /** Overflow-safe `later - earlier <= tol` for call sites where
    * `later >= earlier` mathematically (binary search / merge order
    * guarantees it). A raw Long subtraction wraps negative when the
    * true spread exceeds Long.MaxValue — which, since tol <= MaxValue,
    * always means "outside tolerance" — so `d >= 0 && d <= tol` is
    * exact, not merely fail-closed. */
  def withinTol(later: Long, earlier: Long, tol: Long): Boolean = {
    val d = later - earlier
    d >= 0 && d <= tol
  }

  /** `copyRows` must be true when `rows` come from a shuffle iterator
    * (Spark reuses the row object between next() calls). */
  def buildIndex(rows: Iterator[InternalRow], rightOut: Seq[Attribute],
                 rk: Expression, rt: Expression, rb: Expression,
                 copyRows: Boolean): Index = {
    val keyEval = keyEvaluator(rk, rightOut, copyKeys = true)
    val timeEval = BindReferences.bindReference(rt, rightOut)
    val tieEval = BindReferences.bindReference(rb, rightOut)
    val grouped = new java.util.HashMap[Any,
      scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]
    rows.foreach { row0 =>
      if (timeEval.eval(row0) != null) {
        val row = if (copyRows) row0.copy() else row0
        // the HashMap key must be derived from the STABLE row: with a
        // reused shuffle row a UTF8String key would be a view into a
        // buffer the iterator overwrites on the next next(). One
        // evaluation per row — null keys fall through to the skip.
        val k = keyEval(row)
        if (k != null) { // null keys match nothing — never index them
          val t = timeEval.eval(row)
          val tie = tieEval.eval(row) match {
            case null => Long.MinValue
            case v => toLongTime(v)
          }
          var buf = grouped.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            grouped.put(k, buf)
          }
          buf += ((toLongTime(t), tie, row))
        }
      }
    }
    val index = new Index
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortBy(e => (e._1, e._2)).toArray
      index.put(k, (sorted.map(_._1), sorted.map(_._3)))
    }
    index
  }

  def probe(leftIter: Iterator[InternalRow], index: Index,
            leftOut: Seq[Attribute], rightOut: Seq[Attribute],
            outAttrs: Seq[Attribute],
            lk: Expression, lt: Expression, direction: String,
            tolerance: Long, joinType: String,
            numMatched: SQLMetric, numNullPadded: SQLMetric): Iterator[InternalRow] = {
    // probe keys are transient (looked up, never stored) — no copy
    val lKeyEval = keyEvaluator(lk, leftOut, copyKeys = false)
    val lTimeEval = BindReferences.bindReference(lt, leftOut)
    val joined = new JoinedRow
    val nullRight = new GenericInternalRow(rightOut.length)
    // the projection input schema must carry the OUTER-JOIN nullability
    // on the right side: binding against the raw right attributes lets
    // codegen skip the null checks for non-nullable inputs (e.g. a
    // local relation of longs) and read a null-pad row as ZEROS.
    // ANTI emits left columns only, so it binds against the left alone.
    val project =
      if (joinType == "anti") UnsafeProjection.create(outAttrs, leftOut)
      else UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
    val wantBack = direction != "forward"
    val wantFwd = direction != "backward"
    def findMatch(lrow: InternalRow): InternalRow = {
      val k = lKeyEval(lrow)
      val t = lTimeEval.eval(lrow)
      var matched: InternalRow = nullRight
      if (k != null && t != null) {
        val entry = index.get(k)
        if (entry != null) {
          val (times, rows) = entry
          val n = times.length
          val tv = toLongTime(t)
          // b: rightmost slot with times(b) <= t — the array is sorted
          // (time, tie) ascending, so the last of an equal-time run is
          // the greatest tie-break (backward's tie rule)
          var b = -1
          if (wantBack) {
            var lo = 0; var hi = n - 1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= tv) { b = mid; lo = mid + 1 }
              else hi = mid - 1
            }
          }
          // f: leftmost slot with times(f) >= t — the first of an
          // equal-time run is the smallest tie-break (forward's rule)
          var f = n
          if (wantFwd) {
            var lo = 0; var hi = n - 1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) >= tv) { f = mid; hi = mid - 1 }
              else lo = mid + 1
            }
          }
          // tolerance: a candidate farther than `tolerance` is no match
          // (withinTol is overflow-safe for pathological time spreads)
          if (b >= 0 && !withinTol(tv, times(b), tolerance)) b = -1
          if (f < n && !withinTol(times(f), tv, tolerance)) f = n
          direction match {
            case "forward" => if (f < n) matched = rows(f)
            case "backward" => if (b >= 0) matched = rows(b)
            case _ => // nearest: closer wins, backward on equal distance
              if (b >= 0 && (f >= n || tv - times(b) <= times(f) - tv))
                matched = rows(b)
              else if (f < n) matched = rows(f)
          }
        }
      }
      if (matched eq nullRight) numNullPadded += 1 else numMatched += 1
      matched
    }
    // OUTER stays a straight map (the hot path allocates nothing per
    // row); INNER/ANTI filter on match-ness before projecting
    joinType match {
      case "inner" => leftIter.flatMap { lrow =>
        val m = findMatch(lrow)
        if (m eq nullRight) Iterator.empty
        else Iterator.single(project(joined(lrow, m)))
      }
      case "anti" => leftIter.flatMap { lrow =>
        if (findMatch(lrow) eq nullRight) Iterator.single(project(lrow))
        else Iterator.empty
      }
      case _ => leftIter.map { lrow =>
        project(joined(lrow, findMatch(lrow)))
      }
    }
  }

  /** Per-operator metrics shared by both physical shapes: how many
    * probe rows found an as-of match vs were null-padded — the
    * first thing to look at when an as-of result looks thin. */
  def metricsFor(sc: org.apache.spark.SparkContext): Map[String, SQLMetric] =
    Map(
      "numMatched" -> SQLMetrics.createMetric(sc, "matched probe rows"),
      "numNullPadded" -> SQLMetrics.createMetric(sc, "null-padded probe rows"))
}

/** Broadcast backward as-of join: probe side streamed in place, build
  * side broadcast once and indexed per task. */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    direction: String,
    tolerance: Long,
    joinType: String) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    AsOfCore.outputFor(joinType, left.output, right.output)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override lazy val metrics: Map[String, SQLMetric] =
    AsOfCore.metricsFor(sparkContext)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRight = right.executeBroadcast[Array[InternalRow]]()
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lk, lt) = (leftKey, leftTime)
    val (rk, rt, rb) = (rightKey, rightTime, rightTieBreak)
    val dir = direction
    val tol = tolerance
    val jt = joinType
    val (nm, np) = (longMetric("numMatched"), longMetric("numNullPadded"))
    left.execute().mapPartitions { leftIter =>
      val index = AsOfCore.buildIndex(broadcastRight.value.iterator,
        rightOut, rk, rt, rb, copyRows = false)
      AsOfCore.probe(leftIter, index, leftOut, rightOut, outAttrs, lk, lt,
        dir, tol, jt, nm, np)
    }
  }
}

/** Shuffled backward as-of join: both sides hash-clustered on the key,
  * each task builds the index from ITS right partition (bounded by the
  * per-key right volume, not the whole table) and streams its left
  * partition — the right-too-big-for-broadcast path. */
case class ShuffledAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    direction: String,
    tolerance: Long,
    joinType: String) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    AsOfCore.outputFor(joinType, left.output, right.output)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override lazy val metrics: Map[String, SQLMetric] =
    AsOfCore.metricsFor(sparkContext)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ShuffledAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lk, lt) = (leftKey, leftTime)
    val (rk, rt, rb) = (rightKey, rightTime, rightTieBreak)
    val dir = direction
    val tol = tolerance
    val jt = joinType
    val (nm, np) = (longMetric("numMatched"), longMetric("numNullPadded"))
    left.execute().zipPartitions(right.execute()) { (leftIter, rightIter) =>
      val index = AsOfCore.buildIndex(rightIter, rightOut, rk, rt, rb,
        copyRows = true)
      AsOfCore.probe(leftIter, index, leftOut, rightOut, outAttrs, lk, lt,
        dir, tol, jt, nm, np)
    }
  }
}

/** Sort-merge backward as-of join — the skew/spill-complete shape.
  * Both sides hash-clustered on the key AND sorted within partitions
  * (left by (key, time), right by (key, time, tie-break)); Spark's own
  * SortExec does the heavy lifting with full spill support, and the
  * merge itself holds ONE candidate right row per key group — O(1)
  * state where ShuffledAsOfJoinExec holds the whole right partition in
  * a hash index. A hot key at 100 TB streams through here where the
  * hash path would OOM — the same trade as Spark's own SMJ vs SHJ. */
case class SortMergeAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    direction: String,
    tolerance: Long,
    joinType: String) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    AsOfCore.outputFor(joinType, left.output, right.output)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] =
    AsOfCore.metricsFor(sparkContext)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SortMergeAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lk, lt) = (leftKey, leftTime)
    val (rk, rt) = (rightKey, rightTime)
    val keyType = leftKey.dataType
    val dir = direction
    val tol = tolerance
    val jt = joinType
    val (nm, np) = (longMetric("numMatched"), longMetric("numNullPadded"))
    left.execute().zipPartitions(right.execute()) { (leftIter, rightIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val lKeyEval = BindReferences.bindReference(lk, leftOut)
      val lTimeEval = BindReferences.bindReference(lt, leftOut)
      val rKeyEval = BindReferences.bindReference(rk, rightOut)
      val rTimeEval = BindReferences.bindReference(rt, rightOut)
      val buffered = rightIter.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      // right side nullability-adjusted — see AsOfCore.probe
      val project =
        if (jt == "anti") UnsafeProjection.create(outAttrs, leftOut)
        else UnsafeProjection.create(outAttrs,
          leftOut ++ rightOut.map(_.withNullability(true)))
      // backward keeps the last consumed qualifier (a COPY — it must
      // outlive the rows the iterator reuses); forward only needs a
      // PEEK at the un-consumed head, which stays valid until our own
      // next() call. nearest uses both.
      val keepBack = dir != "forward"
      var candidate: InternalRow = null
      var candidateKey: Any = null
      // the merge advance is STATEFUL (candidate/buffered head carry
      // across left rows), so every left row must pass through
      // findMatch exactly once regardless of whether its output row
      // is emitted — the INNER/ANTI filters below sit outside it
      def findMatch(lrow: InternalRow): InternalRow = {
        val k = lKeyEval.eval(lrow)
        val t = lTimeEval.eval(lrow)
        var matched: InternalRow = nullRight
        // keyIsNull (not a bare null check): a multi-column key with
        // any null FIELD matches nothing, same as the hash paths
        if (!AsOfCore.keyIsNull(keyType, k) && t != null) {
          val tv = AsOfCore.toLongTime(t)
          if (candidate != null && keyOrd.compare(candidateKey, k) != 0)
            candidate = null // left moved to a new key group
          // consume rights up to the direction's threshold: backward/
          // nearest take time <= t (last consumed = back candidate),
          // forward drops strictly-before rows only, so the head is
          // the earliest at-or-after
          var advancing = true
          while (advancing && buffered.hasNext) {
            val rrow = buffered.head
            val rkv = rKeyEval.eval(rrow)
            val rtv = rTimeEval.eval(rrow)
            if (AsOfCore.keyIsNull(keyType, rkv) || rtv == null) {
              buffered.next(); ()
            }
            else {
              val c = keyOrd.compare(rkv, k)
              if (c < 0) { buffered.next(); () } // before our key group
              else if (c == 0 && (if (keepBack)
                  AsOfCore.toLongTime(rtv) <= tv
                else AsOfCore.toLongTime(rtv) < tv)) {
                // sorted (time, tie) ascending: the LAST consumed
                // qualifier is the max — same tie semantics as the
                // hash-index probe's rightmost binary search.
                // candidateKey must come from the stable COPY: rkv may
                // be a UTF8String view into the sort iterator's record
                // buffer, which spill readers reuse between rows
                if (keepBack) {
                  candidate = buffered.next().copy()
                  candidateKey = rKeyEval.eval(candidate)
                } else { buffered.next(); () }
              } else advancing = false // beyond this key, or time >= t
            }
          }
          var back =
            if (candidate != null && keyOrd.compare(candidateKey, k) == 0)
              candidate else null
          if (back != null && !AsOfCore.withinTol(
              tv, AsOfCore.toLongTime(rTimeEval.eval(back)), tol))
            back = null // candidate stays retained, just not a match
          // forward candidate: the head, iff still in our key group
          // (its time/key are non-null — null-first sorting means null
          // rows of this key were consumed above)
          var fwd: InternalRow = null
          if (dir != "backward" && buffered.hasNext) {
            val h = buffered.head
            val hk = rKeyEval.eval(h)
            if (!AsOfCore.keyIsNull(keyType, hk) &&
                keyOrd.compare(hk, k) == 0 && AsOfCore
                .withinTol(AsOfCore.toLongTime(rTimeEval.eval(h)), tv, tol))
              fwd = h
          }
          matched = dir match {
            case "backward" => if (back != null) back else nullRight
            case "forward" => if (fwd != null) fwd else nullRight
            case _ =>
              if (back != null && (fwd == null ||
                  tv - AsOfCore.toLongTime(rTimeEval.eval(back)) <=
                    AsOfCore.toLongTime(rTimeEval.eval(fwd)) - tv)) back
              else if (fwd != null) fwd
              else nullRight
          }
        }
        if (matched eq nullRight) np += 1 else nm += 1
        matched
      }
      jt match {
        case "inner" => leftIter.flatMap { lrow =>
          val m = findMatch(lrow)
          if (m eq nullRight) Iterator.empty
          else Iterator.single(project(joined(lrow, m)))
        }
        case "anti" => leftIter.flatMap { lrow =>
          if (findMatch(lrow) eq nullRight) Iterator.single(project(lrow))
          else Iterator.empty
        }
        case _ => leftIter.map { lrow =>
          project(joined(lrow, findMatch(lrow)))
        }
      }
    }
  }
}

/** Planner strategy mapping the logical as-of node onto a physical
  * operator (injected via SparkSessionExtensions / extraStrategies),
  * mirroring Spark's JoinSelection ladder:
  *   1. right side under spark.sql.autoBroadcastJoinThreshold →
  *      broadcast (no shuffle of the probe side);
  *   2. right side small enough to hash per partition (the same
  *      criterion as JoinSelection's canBuildLocalHashMapBySize:
  *      estimated size <= threshold × shuffle partitions) →
  *      shuffled hash-index;
  *   3. otherwise → sort-merge (spill-safe, O(1) merge state — the
  *      only shape that survives a hot key at 100 TB).
  * spark.graft.asof.impl = broadcast|shuffled_hash|sort_merge
  * overrides the ladder (like Spark's join hints). */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, dir, tol, jt) =>
      def broadcast = BroadcastAsOfJoinExec(
        planLater(l), planLater(r), lk, rk, lt, rt, tb, dir, tol, jt)
      def shuffled = ShuffledAsOfJoinExec(
        planLater(l), planLater(r), lk, rk, lt, rt, tb, dir, tol, jt)
      def sortMerge = SortMergeAsOfJoinExec(
        planLater(l), planLater(r), lk, rk, lt, rt, tb, dir, tol, jt)
      val conf = SQLConf.get
      val exec = conf.getConfString("spark.graft.asof.impl", "auto") match {
        case "broadcast" => broadcast
        case "shuffled_hash" => shuffled
        case "sort_merge" => sortMerge
        case _ =>
          val threshold = conf.autoBroadcastJoinThreshold
          // hash bound falls back to the 10 MB default when broadcast
          // is disabled outright (threshold = -1), so disabling
          // broadcast alone doesn't also disable the hash path
          val hashBound =
            (if (threshold > 0) threshold else 10L << 20) *
              conf.numShufflePartitions
          if (threshold > 0 && r.stats.sizeInBytes <= threshold) broadcast
          else if (r.stats.sizeInBytes <= hashBound) shuffled
          else sortMerge
      }
      exec :: Nil
    case PartitionSweepPlan(v, t, live, tn, child) =>
      PartitionSweepExec(v, t, live, tn, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor: resolve the named columns against each
  * side's analyzed plan, validate the time/tie-break types at PLAN
  * BUILD time (the execs normalize them to Long — an unsupported type
  * must be an analysis-time error, not a task MatchError), and
  * materialize the custom node. */
object AsOfJoinOps {
  import org.apache.spark.sql.types._

  /** Types whose InternalRow representation is Long or Int — what the
    * as-of probe's binary search / merge can order natively. */
  private val longBacked: Set[DataType] =
    Set(LongType, IntegerType, DateType, TimestampType, TimestampNTZType)

  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: String,
           direction: String = "backward",
           tolerance: Long = Long.MaxValue,
           joinType: String = "outer"): DataFrame =
    asofBy(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      rightTieBreak, direction, tolerance, joinType)

  /** Multi-column match keys — pandas merge_asof's `by=[k1, k2, ...]`
    * (instrument AND venue, user AND device). A single key stays the
    * plain attribute (identical plan to before); multiple keys become
    * ONE struct key expression, which every physical shape already
    * handles: hash paths key their index on the fields' UnsafeRow
    * (byte-wise equality), sort-merge orders by the struct's
    * interpreted ordering, and a null in ANY key column matches
    * nothing (SQL equality), uniformly across shapes. */
  def asofBy(left: DataFrame, right: DataFrame,
             leftKeys: Seq[String], rightKeys: Seq[String],
             leftTime: String, rightTime: String,
             rightTieBreak: String,
             direction: String = "backward",
             tolerance: Long = Long.MaxValue,
             joinType: String = "outer"): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward|forward|nearest, got $direction")
    require(tolerance > 0, s"as-of tolerance must be positive, got $tolerance")
    require(Set("outer", "inner", "anti").contains(joinType),
      s"as-of joinType must be outer|inner|anti, got $joinType")
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      s"as-of needs matching key lists, got $leftKeys vs $rightKeys")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    def requireOrderable(role: String, a: Attribute): Attribute = {
      if (!longBacked.contains(a.dataType))
        throw new IllegalArgumentException(
          s"as-of $role column ${a.name} has type " +
            s"${a.dataType.simpleString}; supported: bigint, int, date, " +
            "timestamp, timestamp_ntz (cast explicitly, e.g. " +
            "unix_micros(ts))")
      a
    }
    val lks = leftKeys.map(attr(lp, _))
    val rks = rightKeys.map(attr(rp, _))
    // key types must MATCH pairwise: an int-vs-bigint pair would box
    // to Integer vs Long on the hash paths and silently never match —
    // an analysis-time error, not an empty result
    lks.zip(rks).foreach { case (l, r) =>
      require(org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(
          l.dataType, r.dataType),
        s"as-of key type mismatch: ${l.name}: ${l.dataType.simpleString} " +
          s"vs ${r.name}: ${r.dataType.simpleString} — cast one side")
    }
    // ...and be ORDERABLE: the sort-merge shape sorts and compares on
    // the key, so a map-typed key would fail at task time with an
    // obscure ordering error while the hash shapes succeed — make it
    // an analysis-time error, uniform across shapes
    lks.foreach { l =>
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(l.dataType),
        s"as-of key column ${l.name} has non-orderable type " +
          s"${l.dataType.simpleString}")
    }
    def keyExpr(as: Seq[Attribute]): Expression =
      if (as.length == 1) as.head
      else org.apache.spark.sql.catalyst.expressions.CreateStruct(as)
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, keyExpr(lks), keyExpr(rks),
        requireOrderable("time", attr(lp, leftTime)),
        requireOrderable("time", attr(rp, rightTime)),
        requireOrderable("tie-break", attr(rp, rightTieBreak)),
        direction, tolerance, joinType))
  }
}
