package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Window helpers. */
object Windows {

  /** A constant-zero, NON-foldable partition key for deliberately
    * bounded windows (shortlists, vocab top-k, state-sized frames):
    * pins the window to one partition — the evaluation such a frame
    * needs anyway — without `WindowExec`'s "No Partition Defined" WARN
    * flooding driver-captured output (r9's bench artifact was lost to
    * exactly that noise).
    *
    * A plain `lit(0)` does not work: Catalyst's
    * `EliminateWindowPartitions` removes foldable partition keys and
    * the plan round-trips to the unpartitioned warning. Nor does
    * `hash(anchor) * 0` — multiply-by-zero over the non-nullable hash
    * IS arithmetic-simplified to a literal and then eliminated.
    * `pmod(hash(anchor), 1)` survives: it references an attribute, no
    * simplification rule folds a modulo-by-one, its value is 0 for
    * every row (hash never returns null), so all rows land in the one
    * partition the bounded frame needs anyway.
    *
    * The PlanSpec tripwire asserts no query plan retains an
    * empty-partition Window node, making this an enforced invariant
    * rather than a convention.
    */
  def zeroKey(anchor: Column): Column = pmod(hash(anchor), lit(1))
}
