package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

import graft.core.Layout

/** Marker file index for a scan the rule already pruned: carries the
  * surviving file list (each root path is one data FILE) and tells the
  * rule not to re-fire. Subclassing [[InMemoryFileIndex]] keeps every
  * downstream contract — V1 file-source planning, partition listing,
  * size statistics — exactly as a hand-built `spark.read.parquet(kept)`
  * would have them.
  */
class ZoneMapPrunedIndex(
    spark: SparkSession, files: Seq[Path], schema: StructType)
  extends InMemoryFileIndex(spark, files, Map.empty[String, String], Some(schema))

/** Optimizer rule: AUTOMATIC zone-map data skipping. q224's
  * [[graft.core.Layout.prunedRead]] is the explicit API — the operator
  * calls it instead of `spark.read.parquet`; this rule is the (c)-tier
  * Catalyst form of the same capability: a DECLARED
  * `spark.read.parquet(dir).filter(ranges…)` over a table that carries
  * a `_graft_zonemaps` manifest has its FILE LIST pruned at
  * optimization time, before a single parquet footer opens — the
  * planner-side skip Delta/Iceberg perform from their add-file stats,
  * supplied here to plain parquet directories. The user query does not
  * change; the Filter stays on top as the residual, so the result is
  * row-identical to the full scan by construction.
  *
  * The third member of the rule family (range join, as-of join, scan
  * pruning) — each takes semantics a user DECLARES naturally and
  * substitutes the plan that survives 100 TB.
  *
  * OPT-IN (`spark.graft.zonemap.auto` = true) and fail-safe: every
  * guard below falls back to the untouched full scan, which is always
  * row-correct. In particular a STALE manifest (live files ≠
  * manifested files) silently disables pruning here — the opposite of
  * [[Layout.prunedFiles]]'s hard error, because an automatic rewrite
  * must never turn a correct declared query into an error (or worse, a
  * wrong answer).
  *
  * Scope guards, all required before firing:
  *  - Filter directly over a V1 parquet `LogicalRelation` with no
  *    partition columns and no bucketing, whose root is EITHER a
  *    single directory OR a [[graft.core.VersionLog]] committed view
  *    (one root per data file, as `readVersion` plans it — recognized
  *    by the `_graft_log` above them and a root set equal to the
  *    committed live set, so an old-version read never prunes with
  *    the head's manifest);
  *  - the root carries a zone-map manifest whose file set exactly
  *    matches the live listing;
  *  - at least one conjunct is a range/equality between a bare (or
  *    long-cast) integral attribute and a foldable integral literal,
  *    and the manifest carries `col__min`/`col__max` stats for it —
  *    all other conjuncts simply don't prune;
  *  - the rewrite is skipped when every file survives (nothing to
  *    gain) and never re-fires (the marker index class is ours alone).
  *
  * Driver-side cost when armed: one read of the (file-count-sized)
  * manifest table and one listing of the data directory per matched
  * scan — the same metadata-scale bound every lakehouse planner
  * accepts, and orders of magnitude below opening the footers of the
  * files being skipped.
  */
object ZoneMapPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  val AutoConf = "spark.graft.zonemap.auto"

  /** Re-entrancy guard: reading the manifest inside [[apply]] triggers
    * a nested analysis/optimization of the manifest scan itself.
    */
  private val pruning = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Hook into a LIVE session (extensions can only be injected at
    * build time). Idempotent; inert until [[AutoConf]] is set.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def enabled: Boolean =
    scala.util.Try(conf.getConfString(AutoConf)).toOption
      .flatMap(_.toBooleanOption).getOrElse(false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (pruning.get() || !enabled) plan
    else plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation)
          if rel.relation.isInstanceOf[HadoopFsRelation] =>
        rewrite(f, cond, rel).getOrElse(f)
    }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** A bare integral attribute, or one under the order-preserving
    * widening cast the analyzer inserts when the literal is wider
    * (manifest stats are long-cast, so the long space is the right
    * comparison space either way).
    */
  private def asAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if integral(a.dataType) => Some(a)
    case c: Cast if c.dataType == LongType =>
      c.child match {
        case a: AttributeReference if integral(a.dataType) => Some(a)
        case _ => None
      }
    case _ => None
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v, dt) if v != null && integral(dt) => dt match {
      case LongType => Some(v.asInstanceOf[Long])
      case IntegerType => Some(v.asInstanceOf[Int].toLong)
      case ShortType => Some(v.asInstanceOf[Short].toLong)
      case ByteType => Some(v.asInstanceOf[Byte].toLong)
      case _ => None
    }
    case _ => None
  }

  private def inc(v: Long): Option[Long] =
    if (v == Long.MaxValue) None else Some(v + 1)
  private def dec(v: Long): Option[Long] =
    if (v == Long.MinValue) None else Some(v - 1)

  /** (attribute, literal, attrIsLeft) when exactly one side of a
    * binary comparison is a supported attribute and the other a
    * supported literal — pattern binders alone can't tell the two
    * orientations apart, so this does it explicitly.
    */
  private def sides(
      x: Expression, y: Expression): Option[(AttributeReference, Long, Boolean)] =
    (for (a <- asAttr(x); v <- litLong(y)) yield (a, v, true))
      .orElse(for (a <- asAttr(y); v <- litLong(x)) yield (a, v, false))

  /** One conjunct → an inclusive (column, lo, hi) box, when it is a
    * supported attribute-vs-literal comparison in either orientation.
    */
  private def asBox(e: Expression): Option[(String, Long, Long)] = {
    val Max = Long.MaxValue
    val Min = Long.MinValue
    e match {
      case GreaterThanOrEqual(x, y) => sides(x, y).map {
        case (a, v, true)  => (a.name, v, Max) // a >= v
        case (a, v, false) => (a.name, Min, v) // v >= a
      }
      case LessThanOrEqual(x, y) => sides(x, y).map {
        case (a, v, true)  => (a.name, Min, v) // a <= v
        case (a, v, false) => (a.name, v, Max) // v <= a
      }
      case GreaterThan(x, y) => sides(x, y).flatMap {
        case (a, v, true)  => inc(v).map(lo => (a.name, lo, Max)) // a > v
        case (a, v, false) => dec(v).map(hi => (a.name, Min, hi)) // v > a
      }
      case LessThan(x, y) => sides(x, y).flatMap {
        case (a, v, true)  => dec(v).map(hi => (a.name, Min, hi)) // a < v
        case (a, v, false) => inc(v).map(lo => (a.name, lo, Max)) // v < a
      }
      case EqualTo(x, y) => sides(x, y).map {
        case (a, v, _) => (a.name, v, v)
      }
      case _ => None
    }
  }

  /** The table root of a VERSIONED committed-view scan, when that is
    * what `files` is: [[graft.core.VersionLog.readVersion]] plans one
    * root path PER DATA FILE, so a multi-root scan qualifies exactly
    * when (a) a common ancestor within a few levels carries both a
    * `_graft_log` and a zone-map manifest, (b) every root lies under
    * it, and (c) the root set EQUALS the table's committed live set —
    * an old-version read (a different file list) must NOT be pruned
    * with the head's manifest, whose file universe it does not share.
    */
  private def versionedRootOf(
      spark: SparkSession, files: Seq[Path]): Option[(Path, Set[String])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    var cand = files.head.getParent
    var found: Option[Path] = None
    var depth = 0
    while (cand != null && depth < 4 && found.isEmpty) {
      val f = cand.getFileSystem(conf)
      if (f.exists(new Path(cand, graft.core.VersionLog.LogDir)) &&
          f.exists(new Path(cand, Layout.ManifestDir)))
        found = Some(cand)
      else { cand = cand.getParent; depth += 1 }
    }
    // the live set computed here is RETURNED so the staleness identity
    // inside prunedFilesIfFresh reuses it — one committed-live listing
    // per pruned scan, not two (r12 verdict stretch ask #10)
    found.flatMap { root =>
      val rootStr = root.toUri.getPath
      val live = Layout.dataFiles(spark, root.toString)
      if (files.forall(_.toUri.getPath.startsWith(rootStr + "/")) &&
          files.map(_.toUri.getPath).toSet == live)
        Some((root, live))
      else None
    }
  }

  private def rewrite(
      f: Filter, cond: Expression, rel: LogicalRelation): Option[LogicalPlan] = {
    val fs = rel.relation.asInstanceOf[HadoopFsRelation]
    if (fs.location.isInstanceOf[ZoneMapPrunedIndex]) return None
    if (!fs.fileFormat.isInstanceOf[ParquetFileFormat]) return None
    if (fs.partitionSchema.nonEmpty || fs.bucketSpec.nonEmpty) return None
    if (fs.location.rootPaths.isEmpty) return None
    val (root, knownLive) =
      if (fs.location.rootPaths.length == 1)
        (fs.location.rootPaths.head, None)
      else versionedRootOf(fs.sparkSession, fs.location.rootPaths) match {
        case Some((r, live)) => (r, Some(live))
        case None => return None
      }

    // boxes per column: intersect repeated constraints (a >= 10 AND
    // a <= 50 → one [10, 50] box); a contradiction (lo > hi) keeps
    // zero files, which the residual filter confirms with zero rows.
    val boxes = splitConjunctivePredicates(cond).flatMap(asBox)
      .groupBy(_._1).map { case (c, bs) =>
        (c, bs.map(_._2).max, bs.map(_._3).min)
      }.toSeq.sortBy(_._1)
    if (boxes.isEmpty) return None

    val spark = fs.sparkSession
    // An unsatisfiable conjunction (a >= 10 AND a <= 5 merges to a
    // lo > hi box) matches no ROW at all, so the scan needs no FILES —
    // the per-file min/max intersection test alone would still keep
    // every file wide enough to straddle both bounds.
    if (boxes.exists { case (_, lo, hi) => lo > hi }) {
      logInfo(s"ZoneMapPruneRule: $root filter is unsatisfiable " +
        s"on ${boxes.filter(b => b._2 > b._3).map(_._1).mkString(", ")}; " +
        "scanning zero files")
      val idx = new ZoneMapPrunedIndex(spark, Nil, fs.dataSchema)
      return Some(Filter(cond,
        new LogicalRelation(
          fs.copy(location = idx)(spark), rel.output,
          rel.catalogTable, rel.isStreaming, rel.stream)))
    }
    pruning.set(true)
    val pruned =
      try Layout.prunedFilesIfFresh(spark, root.toString, boxes, knownLive)
      catch {
        case e: Exception =>
          logWarning(s"zone-map pruning failed for $root; " +
            s"scanning unpruned: ${e.getMessage}")
          None
      } finally pruning.set(false)
    val (kept, total) = pruned.getOrElse(return None)
    if (kept.length >= total) return None
    logInfo(s"ZoneMapPruneRule: $root scan pruned to " +
      s"${kept.length}/$total files by ${boxes.mkString(", ")}")

    val idx = new ZoneMapPrunedIndex(
      spark, kept.map(new Path(_)), fs.dataSchema)
    val newRel = fs.copy(location = idx)(spark)
    Some(Filter(cond,
      new LogicalRelation(
        newRel, rel.output, rel.catalogTable, rel.isStreaming, rel.stream)))
  }
}
