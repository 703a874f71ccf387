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
  * OPT-IN by config: the bucket width is operator knowledge (a width
  * far below typical interval length multiplies rows; far above it
  * degrades pruning), so the rule fires only when
  * `spark.graft.intervalJoin.bucket` is set to a positive long —
  * never behind the user's back. Scope guards, all required before
  * firing:
  *  - INNER join whose condition is EXACTLY the two sandwich
  *    conjuncts (a join that also has an equality key is already an
  *    equi-join — Spark handles the range as a residual there);
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

  override def apply(plan: LogicalPlan): LogicalPlan = bucketWidth match {
    case None => plan
    case Some(b) =>
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(cond), _) =>
          rewrite(j, cond, b).getOrElse(j)
      }
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

  private def rewrite(j: Join, cond: Expression, b: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None
    val parsed = Seq(conjuncts, conjuncts.reverse).flatMap {
      case Seq(c1, c2) => for {
        (p1, lo) <- asLower(c1)
        (p2, hi) <- asUpper(c2)
        if p1.semanticEquals(p2)
      } yield (p1, lo, hi)
      case _ => None
    }.headOption
    val (point, lo, hi) = parsed.getOrElse(return None)
    if (point.dataType != LongType || lo.dataType != LongType ||
      hi.dataType != LongType) return None
    if (!point.deterministic || !lo.deterministic || !hi.deterministic)
      return None
    // sides: point from one child, both bounds from the other
    val fromLeft = (e: Expression) =>
      e.references.nonEmpty && e.references.subsetOf(j.left.outputSet)
    val fromRight = (e: Expression) =>
      e.references.nonEmpty && e.references.subsetOf(j.right.outputSet)
    val pointOnLeft =
      if (fromLeft(point) && fromRight(lo) && fromRight(hi)) true
      else if (fromRight(point) && fromLeft(lo) && fromLeft(hi)) false
      else return None

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
