package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Range-predicate builder (reference: `make_range_query`,
  * /root/reference/utils.py:32-66): turns a list of half-open ranges
  * into one boolean Column `(f >= a AND f < b) OR (f >= c) OR ...`.
  *
  * Emitted as a plain Catalyst expression tree so parquet row-group
  * pruning and partition pruning both see it.
  */
object Ranges {

  /** One range: [bottom, upper). `None` bounds are open; both-None means
    * `f IS NOT NULL` (matching the reference's fallback, utils.py:65).
    */
  def rangePredicate(field: Column, bottom: Option[Long], upper: Option[Long]): Column =
    (bottom, upper) match {
      case (Some(a), Some(b)) => field >= a && field < b
      case (Some(a), None)    => field >= a
      case (None, Some(b))    => field < b
      case (None, None)       => field.isNotNull
    }

  /** OR-of-ranges over the same field. */
  def rangesPredicate(field: Column, ranges: Seq[(Option[Long], Option[Long])]): Column = {
    require(ranges.nonEmpty, "at least one range required")
    ranges.map { case (a, b) => rangePredicate(field, a, b) }.reduce(_ || _)
  }
}
