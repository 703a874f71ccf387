package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization kernels — the canonicalization a web
  * corpus needs BEFORE any hash-keyed dedup: the same visible string
  * arrives precomposed (U+00E9) from one crawler and decomposed
  * (e + U+0301) from another, and every md5-keyed operator in the
  * engine would treat them as distinct documents. NFC composes to the
  * canonical form; accent folding (NFD, drop the combining marks —
  * DuckDB `strip_accents` semantics) is the harder normalization
  * matching/search keys want.
  */
object TextNorm {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(Marks.matcher(d).replaceAll(""))
  }
}

/** `nfc_normalize(text)` — Unicode NFC canonical composition. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextNorm.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextNorm.nfc($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** `strip_accents(text)` — NFD decomposition minus combining marks. */
case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextNorm.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextNorm.stripAccents($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "strip_accents"
}

/** Column wrappers. */
object TextNormFunctions {
  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.eagerExpression(c)))
  def stripAccents(c: Column): Column =
    GraftBridge.column(StripAccentsExpr(GraftBridge.eagerExpression(c)))
}
