package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick, CACM'75) — the
  * blocklist/canary scan at 100 TB: ONE automaton pass per document
  * regardless of how many patterns are loaded, vs P separate
  * `contains`/`LIKE` scans whose cost is P·len. The automaton builds
  * once on the driver and rides into generated code as a reference
  * object, so the matcher stays inside whole-stage codegen (the same
  * stance as the hex/sketch kernels: compiled kernel call, no UDF
  * boxing, no codegen fallback).
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick requires at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everywhere — reject it")

  // Trie over chars with BFS failure links; output lists carry pattern
  // indexes, merged along failure chains at build time so the match
  // walk never follows fail links for output collection.
  private val (next, fail, out) = {
    val nextM = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val outM = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = nextM(s).getOrElseUpdate(ch, {
          nextM += scala.collection.mutable.HashMap.empty[Char, Int]
          outM += Nil
          nextM.size - 1
        })
      }
      outM(s) = pi :: outM(s)
    }
    val failA = new Array[Int](nextM.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    nextM(0).valuesIterator.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      nextM(u).foreach { case (ch, v) =>
        var f = failA(u)
        while (f != 0 && !nextM(f).contains(ch)) f = failA(f)
        failA(v) = if (nextM(f).contains(ch) && nextM(f)(ch) != v) nextM(f)(ch) else 0
        outM(v) = outM(v) ++ outM(failA(v))
        queue.enqueue(v)
      }
    }
    (nextM.map(_.toMap).toArray, failA, outM.map(_.toArray.sorted).toArray)
  }

  /** Distinct matched pattern indexes, ascending. */
  def matches(s: String): Array[Int] = {
    val found = scala.collection.mutable.SortedSet.empty[Int]
    var state = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      while (state != 0 && !next(state).contains(ch)) state = fail(state)
      state = next(state).getOrElse(ch, 0)
      out(state).foreach(found.add)
      i += 1
    }
    found.toArray
  }

  /** Codegen entry point: UTF8String in, Catalyst array out. */
  def matchesArray(s: UTF8String): ArrayData =
    new GenericArrayData(matches(s.toString).map(Int.box).asInstanceOf[Array[Any]])
}

/** `multi_contains(text)` for a fixed pattern list: array<int> of the
  * distinct matched pattern indexes (ascending). Null text → null.
  */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val ac = new AhoCorasick(patterns.toArray)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ac.matchesArray(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.matchesArray($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "multi_contains"
}

object AcFunctions {
  /** One-pass multi-substring scan; returns the matched patterns'
    * indexes into `patterns` (distinct, ascending).
    */
  def multiContains(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(MultiContains(GraftBridge.expression(text), patterns))
}
