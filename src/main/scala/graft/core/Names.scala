package graft.core

import org.apache.spark.sql.DataFrame

/** Collision-free temp-column names: `withColumn` REPLACES an
  * identically-named input column in place, silently corrupting caller
  * data — every operator-internal temp must go through here (the
  * Curation.capPerGroup convention, shared).
  */
object Names {
  def fresh(df: DataFrame, base: String): String = {
    var n = base
    while (df.columns.contains(n)) n += "_"
    n
  }

  /** One fresh name per base, all distinct from `df`'s columns AND
    * from each other.
    */
  def fresh(df: DataFrame, bases: Seq[String]): Seq[String] =
    bases.foldLeft(Vector.empty[String]) { (acc, b) =>
      var n = b
      while (df.columns.contains(n) || acc.contains(n)) n += "_"
      acc :+ n
    }
}
