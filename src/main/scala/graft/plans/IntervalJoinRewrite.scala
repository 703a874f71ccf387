package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a KEYLESS point-in-interval theta join —
  * `points JOIN intervals ON p >= lo AND p < hi` — into the bucketed
  * equi-join [[graft.core.Ranges.intervalJoin]] hand-builds: explode
  * each interval to its fixed-width bucket ids, map each point to its
  * bucket, hash-join on the bucket, re-check the original predicate as
  * a residual. Without the rewrite Catalyst has no equi key and plans
  * a BroadcastNestedLoopJoin — the O(|points|·|intervals|) scan that
  * dies at scale; with it the same DECLARED query runs as a plain
  * shuffle join whose fan-out is ceil(interval width / bucket).
  *
  * This is the (c)-tier Catalyst extension path: the user writes the
  * natural condition, the planner supplies the scalable strategy.
  *
  * OPT-IN by config, two modes — the rule never fires behind the
  * user's back:
  *  - `spark.graft.intervalJoin.bucket` = positive long: fixed width,
  *    operator-chosen (the r10 form);
  *  - `spark.graft.intervalJoin.auto` = true: the rule DERIVES the
  *    width from the data at rewrite time — one bounded driver-side
  *    aggregation over the interval side (md5-gated 1/16 row sample
  *    when it is large enough, full pass otherwise) yielding the p90
  *    interval width and the max. Bucket = max(p90, max/1024, 1): p90
  *    keeps the typical interval in O(1) buckets, the max/1024 floor
  *    caps the worst single interval's explode fan-out at 1024 rows,
  *    so a hand-set width can never silently multiply rows the way a
  *    day-bucket over year-wide intervals would. The explicit bucket
  *    conf, when set, overrides the sample. The choice is logged.
  * A third opt-in, `spark.graft.intervalJoin.keyed` = true, widens the
  * match to KEYED sandwiches — `l.k = r.k AND p >= lo AND p < hi`, the
  * dominant real shape (per-user lookback windows, per-provider IP
  * ranges). Catalyst already plans those as an equi-join on `k` with
  * the range as a residual, which is fine when keys are selective —
  * but a skewed / low-cardinality key degenerates to a per-key-group
  * cartesian (every point × every interval of the hot key flows
  * through the residual). Adding the bucket id as a SECOND hash key
  * splits each key group by time bucket, bounding the candidate set
  * per (key, bucket) regardless of key skew. Because selective keys
  * are better off WITHOUT the explode fan-out, the keyed form never
  * fires unless this conf says so.
  *
  * Scope guards, all required before firing:
  *  - INNER join whose condition is the two sandwich conjuncts, plus
  *    (keyed mode only) any number of cross-side equality conjuncts —
  *    every non-sandwich conjunct must be a deterministic `EqualTo`
  *    spanning the two children or the rule stays out;
  *  - point expression from one side only, both bounds from the other,
  *    all LongType and deterministic;
  *  - rows with NULL point/bounds produce no output either way (the
  *    sandwich is null-rejecting; the bucket equality and the hi > lo
  *    pre-filter drop the same rows);
  *  - empty intervals (hi <= lo) are pre-filtered, matching both the
  *    predicate semantics and Sequence's boundary contract.
  * Registered via `GraftExtensions` (config path) or
  * [[IntervalJoinRewrite.install]] on a live session.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BucketConf = "spark.graft.intervalJoin.bucket"
  val AutoConf = "spark.graft.intervalJoin.auto"
  val KeyedConf = "spark.graft.intervalJoin.keyed"

  /** Smallest gated-sample size the width stats are trusted at; below
    * it the derivation falls back to the ungated full-pass stats (tiny
    * interval sides — a day spine — would otherwise sample to nothing).
    */
  private val MinGatedSample = 256L
  /** Worst-interval explode cap: bucket >= maxWidth/MaxFanout. */
  private val MaxFanout = 1024L

  /** Re-entrancy guard: the width-stats query built in [[deriveBucket]]
    * is itself optimized by this rule (it is registered session-wide);
    * if the interval side CONTAINS a matching sandwich join, deriving
    * inside deriving would recurse without this.
    */
  private val deriving = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Hook into a LIVE session (extensions can only be injected at
    * build time; `experimental.extraOptimizations` is the sanctioned
    * post-hoc seam). Idempotent. The rule stays inert until the
    * bucket config is set.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def bucketWidth: Option[Long] =
    scala.util.Try(conf.getConfString(BucketConf)).toOption
      .flatMap(_.toLongOption).filter(_ > 0)

  private def autoEnabled: Boolean =
    scala.util.Try(conf.getConfString(AutoConf)).toOption
      .flatMap(_.toBooleanOption).getOrElse(false)

  private def keyedEnabled: Boolean =
    scala.util.Try(conf.getConfString(KeyedConf)).toOption
      .flatMap(_.toBooleanOption).getOrElse(false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (deriving.get() || (bucketWidth.isEmpty && !autoEnabled)) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond).getOrElse(j)
    }

  /** AUTO-mode width: one bounded aggregation over the interval side.
    * Gated (md5(lo) 1/16) stats are preferred when the gate keeps at
    * least [[MinGatedSample]] rows — at scale the gate keeps the
    * percentile state small; on tiny sides the ungated pass is
    * authoritative. Returns None (→ no rewrite) when the side is empty
    * or the stats job fails: falling back to Catalyst's nested loop is
    * always row-correct.
    */
  private def deriveBucket(
      intervals: LogicalPlan, lo: Expression, hi: Expression): Option[Long] = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.active
    deriving.set(true)
    try {
      val base = Project(Seq(
          Alias(Subtract(hi, lo), "__graft_w")(),
          Alias(lo, "__graft_g")()),
        Filter(GreaterThan(hi, lo), intervals))
      val row = org.apache.spark.sql.GraftBridge.ofRows(spark, base)
        .select(col("__graft_w").as("w"),
          (substring(md5(col("__graft_g").cast("string")), 1, 1) === "0").as("in"))
        .agg(
          count(when(col("in"), 1)).as("ns"),
          percentile_approx(when(col("in"), col("w")), lit(0.9), lit(1000)).as("p90s"),
          max(when(col("in"), col("w"))).as("maxs"),
          percentile_approx(col("w"), lit(0.9), lit(1000)).as("p90a"),
          max(col("w")).as("maxa"))
        .collect()(0)
      if (row.isNullAt(3)) None // empty interval side
      else {
        val gated = !row.isNullAt(0) && row.getLong(0) >= MinGatedSample
        val (p90, maxW) =
          if (gated) (row.getLong(1), row.getLong(2))
          else (row.getLong(3), row.getLong(4))
        val b = math.max(1L, math.max(p90, maxW / MaxFanout))
        logInfo(s"IntervalJoinRewrite auto bucket=$b " +
          s"(p90=$p90 max=$maxW gatedSample=$gated)")
        Some(b)
      }
    } catch {
      case e: Exception =>
        logWarning(s"IntervalJoinRewrite width sampling failed; " +
          s"leaving the declared join unrewritten: ${e.getMessage}")
        None
    } finally deriving.set(false)
  }

  /** `(point, lo, hi)` when `e` is one side of the sandwich. */
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo)) // p >= lo
    case LessThanOrEqual(lo, p) => Some((p, lo)) // lo <= p
    case _ => None
  }
  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(p, hi) => Some((p, hi)) // p < hi
    case GreaterThan(hi, p) => Some((p, hi)) // hi > p
    case _ => None
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    // Never re-fire on our own output: the rewritten join's condition
    // (bucket equality + original conjuncts) would itself match the
    // KEYED pattern — the bucket equality parses as just another key —
    // and the optimizer's fixed-point batch would stack a fresh
    // explode + width-sampling job per iteration, up to the 100-pass
    // cap (row-correct but catastrophically slow). The marker
    // attributes are ours alone, so their presence means "done".
    if (cond.references.exists(a =>
      a.name == "__graft_pb" || a.name == "__graft_ib")) return None
    val conjuncts = splitConjunctivePredicates(cond)
    // Locate ONE sandwich pair anywhere in the conjunct list; in keyed
    // mode everything else must be a cross-side equality. Keyless mode
    // keeps the strict two-conjunct contract (an equality key means
    // Catalyst already has an equi-join — extra fan-out only pays off
    // when the operator opts in for skewed keys).
    val idx = conjuncts.indices
    val sandwich = (for {
      i <- idx.iterator
      k <- idx.iterator if i != k
      (p1, lo) <- asLower(conjuncts(i)).iterator
      (p2, hi) <- asUpper(conjuncts(k)).iterator
      if p1.semanticEquals(p2)
    } yield (i, k, p1, lo, hi)).nextOption()
    val (li, ui, point, lo, hi) = sandwich.getOrElse(return None)
    val keys = conjuncts.zipWithIndex.collect {
      case (c, n) if n != li && n != ui => c
    }
    if (keys.nonEmpty && !keyedEnabled) return None
    if (point.dataType != LongType || lo.dataType != LongType ||
      hi.dataType != LongType) return None
    if (!point.deterministic || !lo.deterministic || !hi.deterministic)
      return None
    // sides: point from one child, both bounds from the other
    val fromLeft = (e: Expression) =>
      e.references.nonEmpty && e.references.subsetOf(j.left.outputSet)
    val fromRight = (e: Expression) =>
      e.references.nonEmpty && e.references.subsetOf(j.right.outputSet)
    // every key conjunct: a deterministic equality spanning the sides
    val keysOk = keys.forall {
      case EqualTo(a, b) if a.deterministic && b.deterministic =>
        (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case _ => false
    }
    if (!keysOk) return None
    val pointOnLeft =
      if (fromLeft(point) && fromRight(lo) && fromRight(hi)) true
      else if (fromRight(point) && fromLeft(lo) && fromLeft(hi)) false
      else return None

    // Fixed conf width wins; otherwise AUTO mode samples the interval
    // side. Both unavailable (sampling failed / empty side) → no
    // rewrite, nested loop stands.
    val b = bucketWidth.orElse {
      if (autoEnabled)
        deriveBucket(if (pointOnLeft) j.right else j.left, lo, hi)
      else None
    }.getOrElse(return None)

    val bLit = Literal(b, LongType)
    def div(e: Expression) = IntegralDivide(e, bLit)
    val pb = Alias(div(point), "__graft_pb")()
    val ib = AttributeReference("__graft_ib", LongType)()
    def pointSide(child: LogicalPlan) =
      Project(child.output :+ pb, child)
    def intervalSide(child: LogicalPlan) =
      Generate(
        // Sequence is TimeZoneAware even over longs: without an
        // explicit zone the expression is unresolved and the optimizer
        // rejects the rewritten plan
        Explode(new Sequence(div(lo), div(Subtract(hi, Literal(1L, LongType))),
          Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ib),
        child = Filter(GreaterThan(hi, lo), child))
    val (newLeft, newRight) =
      if (pointOnLeft) (pointSide(j.left), intervalSide(j.right))
      else (intervalSide(j.left), pointSide(j.right))
    val newCond = And(EqualTo(pb.toAttribute, ib), cond)
    Some(Project(j.output,
      Join(newLeft, newRight, Inner, Some(newCond), j.hint)))
  }
}
