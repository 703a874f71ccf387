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

/** Deflate-based compressibility — the classic "too repetitive to be
  * natural text" quality signal (boilerplate, keyword stuffing, and
  * template spam compress far below prose): ratio = deflated bytes /
  * raw UTF-8 bytes, level-9 zlib, rounded to 6 decimals. ~0.3-0.4 for
  * English prose, → 0 for highly repetitive spam, > 1 for short or
  * incompressible strings (header overhead). DEFLATE level 9 is a
  * deterministic pure function of the bytes (same JVM output every
  * run/partition) but is NOT SQL-replayable — this operator is
  * spec-gated, not oracle-gated.
  */
object CompressMetrics {
  def deflatedLen(raw: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) 0.0
    else math.floor(deflatedLen(raw).toDouble / raw.length * 1e6 + 0.5) / 1e6
  }
}

/** `compression_ratio(text)` — deflated/raw byte ratio (level-9). */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(s: Any): Any =
    CompressMetrics.ratio(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CompressMetrics.ratio($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "compression_ratio"
}

/** Column wrappers. */
object TextNormFunctions {
  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.eagerExpression(c)))
  def stripAccents(c: Column): Column =
    GraftBridge.column(StripAccentsExpr(GraftBridge.eagerExpression(c)))
  def compressionRatio(c: Column): Column =
    GraftBridge.column(CompressionRatio(GraftBridge.eagerExpression(c)))
}
