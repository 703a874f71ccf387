package graft.eth

import java.math.BigInteger

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Seeded encode→decode round-trip over random ABI type trees: the
  * test carries its OWN spec-following encoder (head/tail layout,
  * region-relative offsets) and its own value renderer, so agreement
  * with [[Abi.decodeInput]] is two independent implementations meeting
  * — the property-test armor for the trickiest decoder paths (nested
  * dynamic arrays, tuples in arrays, mixed static/dynamic heads).
  * Hand-rolled seeded loops (scalacheck bridge unavailable offline).
  */
class AbiPropertySpec extends AnyFunSuite {

  private sealed trait TT
  private case class Elem(name: String) extends TT
  private case class Arr(elem: TT, len: Option[Int]) extends TT // None = dynamic
  private case class Tup(comps: Seq[TT]) extends TT

  private def isDyn(t: TT): Boolean = t match {
    case Elem(n) => n == "bytes" || n == "string"
    case Arr(_, None) => true
    case Arr(e, Some(_)) => isDyn(e)
    case Tup(cs) => cs.exists(isDyn)
  }

  private def canonical(t: TT): String = t match {
    case Elem(n) => n
    case Arr(e, None) => canonical(e) + "[]"
    case Arr(e, Some(k)) => canonical(e) + s"[$k]"
    case Tup(cs) => cs.map(canonical).mkString("(", ",", ")")
  }

  private def typeJson(t: TT, name: String): String = {
    def base(t: TT): TT = t match { case Arr(e, _) => base(e); case other => other }
    def suffix(t: TT): String = t match {
      case Arr(e, None) => suffix(e) + "[]"
      case Arr(e, Some(k)) => suffix(e) + s"[$k]"
      case _ => ""
    }
    base(t) match {
      case Tup(cs) =>
        val comps = cs.zipWithIndex
          .map { case (c, i) => typeJson(c, s"f$i") }.mkString(",")
        s"""{"name":"$name","type":"tuple${suffix(t)}","components":[$comps]}"""
      case Elem(n) => s"""{"name":"$name","type":"$n${suffix(t)}"}"""
      case _: Arr => throw new IllegalStateException("base is never Arr")
    }
  }

  // ---- random values ----------------------------------------------------

  private sealed trait VV
  private case class VInt(v: BigInteger) extends VV
  private case class VBytes(v: Array[Byte]) extends VV
  private case class VStr(v: String) extends VV
  private case class VBool(v: Boolean) extends VV
  private case class VSeq(vs: Seq[VV]) extends VV // array or tuple payload

  private def randType(rng: Random, depth: Int): TT = {
    val elems = Seq("uint256", "uint64", "int256", "address", "bool",
      "bytes4", "bytes32", "bytes", "string")
    if (depth <= 0 || rng.nextInt(3) == 0) Elem(elems(rng.nextInt(elems.length)))
    else rng.nextInt(3) match {
      case 0 => Arr(randType(rng, depth - 1),
        if (rng.nextBoolean()) None else Some(rng.nextInt(3) + 1))
      case _ => Tup((1 to (rng.nextInt(3) + 1))
        .map(_ => randType(rng, depth - 1)))
    }
  }

  private def randValue(rng: Random, t: TT): VV = t match {
    case Elem(n) if n.startsWith("uint") =>
      VInt(new BigInteger(n.substring(4).toInt - 1, rng.self))
    case Elem("int256") =>
      val mag = new BigInteger(128, rng.self)
      VInt(if (rng.nextBoolean()) mag.negate() else mag)
    case Elem("address") => VBytes(Array.fill(20)(rng.nextInt().toByte))
    case Elem("bool") => VBool(rng.nextBoolean())
    case Elem("bytes") => VBytes(Array.fill(rng.nextInt(40))(rng.nextInt().toByte))
    case Elem(n) if n.startsWith("bytes") =>
      VBytes(Array.fill(n.substring(5).toInt)(rng.nextInt().toByte))
    case Elem("string") =>
      VStr(Seq.fill(rng.nextInt(12))((33 + rng.nextInt(93)).toChar).mkString)
    case Arr(e, None) => VSeq(Seq.fill(rng.nextInt(3))(randValue(rng, e)))
    case Arr(e, Some(k)) => VSeq(Seq.fill(k)(randValue(rng, e)))
    case Tup(cs) => VSeq(cs.map(c => randValue(rng, c)))
    case Elem(other) => throw new IllegalStateException(other)
  }

  // ---- independent renderer (what the decoder must print) ---------------

  private def hex(b: Array[Byte]): String = "0x" + b.map("%02x".format(_)).mkString

  private def render(t: TT, v: VV): String = (t, v) match {
    case (Elem(n), VInt(x)) if n.startsWith("uint") => x.toString
    case (Elem("int256"), VInt(x)) => x.toString
    case (Elem("address"), VBytes(b)) => hex(b)
    case (Elem("bool"), VBool(b)) => if (b) "True" else "False"
    case (Elem("string"), VStr(s)) => s
    case (Elem(_), VBytes(b)) => hex(b) // bytes / bytesN
    case (Arr(e, _), VSeq(vs)) => vs.map(render(e, _)).mkString("[", ", ", "]")
    case (Tup(cs), VSeq(vs)) =>
      cs.zip(vs).map { case (c, x) => render(c, x) }.mkString("(", ", ", ")")
    case other => throw new IllegalStateException(other.toString)
  }

  // ---- independent spec-following encoder --------------------------------

  private def word(b: Array[Byte]): Array[Byte] = {
    require(b.length <= 32)
    val w = new Array[Byte](32)
    System.arraycopy(b, 0, w, 32 - b.length, b.length)
    w
  }

  private def uintWord(x: BigInteger): Array[Byte] = {
    val raw = x.toByteArray.dropWhile(_ == 0) // strip sign byte
    word(raw)
  }

  private def intWord(x: BigInteger): Array[Byte] =
    if (x.signum() >= 0) uintWord(x)
    else {
      // two's complement over 256 bits
      uintWord(BigInteger.ONE.shiftLeft(256).add(x))
    }

  private def rightPad(b: Array[Byte]): Array[Byte] = {
    val n = ((b.length + 31) / 32) * 32
    java.util.Arrays.copyOf(b, math.max(n, if (b.isEmpty) 0 else n))
  }

  private def encodeStatic(t: TT, v: VV): Array[Byte] = (t, v) match {
    case (Elem(n), VInt(x)) if n.startsWith("uint") => uintWord(x)
    case (Elem("int256"), VInt(x)) => intWord(x)
    case (Elem("address"), VBytes(b)) => word(b)
    case (Elem("bool"), VBool(b)) =>
      uintWord(if (b) BigInteger.ONE else BigInteger.ZERO)
    case (Elem(n), VBytes(b)) if n != "bytes" => // bytesN: LEFT-aligned
      java.util.Arrays.copyOf(b, 32)
    case (Arr(e, Some(_)), VSeq(vs)) =>
      vs.flatMap(x => encodeStatic(e, x)).toArray
    case (Tup(cs), VSeq(vs)) => encodeSeq(cs.zip(vs))
    case other => throw new IllegalStateException(other.toString)
  }

  private def encodeDynamic(t: TT, v: VV): Array[Byte] = (t, v) match {
    case (Elem("bytes"), VBytes(b)) =>
      uintWord(BigInteger.valueOf(b.length.toLong)) ++ rightPad(b)
    case (Elem("string"), VStr(s)) =>
      val b = s.getBytes("UTF-8")
      uintWord(BigInteger.valueOf(b.length.toLong)) ++ rightPad(b)
    case (Arr(e, None), VSeq(vs)) =>
      uintWord(BigInteger.valueOf(vs.length.toLong)) ++
        encodeSeq(vs.map(x => (e, x)))
    case (Arr(e, Some(_)), VSeq(vs)) => encodeSeq(vs.map(x => (e, x)))
    case (Tup(cs), VSeq(vs)) => encodeSeq(cs.zip(vs))
    case other => throw new IllegalStateException(other.toString)
  }

  /** Head/tail encoding of a region: offsets are relative to the
    * region's own start — the same rule the decoder recurses on.
    */
  private def encodeSeq(tvs: Seq[(TT, VV)]): Array[Byte] = {
    val headSizes = tvs.map { case (t, _) => if (isDyn(t)) 32 else staticSize(t) }
    val headTotal = headSizes.sum
    val head = new scala.collection.mutable.ArrayBuffer[Byte](headTotal)
    val tail = new scala.collection.mutable.ArrayBuffer[Byte]()
    tvs.foreach { case (t, v) =>
      if (isDyn(t)) {
        head ++= uintWord(BigInteger.valueOf((headTotal + tail.length).toLong))
        tail ++= encodeDynamic(t, v)
      } else head ++= encodeStatic(t, v)
    }
    (head ++ tail).toArray
  }

  private def staticSize(t: TT): Int = t match {
    case Elem(_) => 32
    case Arr(e, Some(k)) => k * staticSize(e)
    case Tup(cs) => cs.map(staticSize).sum
    case Arr(_, None) => throw new IllegalStateException("dynamic")
  }

  test("seeded round-trip: 300 random type trees decode to the independent rendering") {
    (0 until 300).foreach { seed =>
      val rng = new Random(seed)
      val types = (1 to (rng.nextInt(3) + 1)).map(_ => randType(rng, 2))
      val values = types.map(t => randValue(rng, t))
      val abi = s"""[{"type":"function","name":"f","inputs":[${
        types.zipWithIndex.map { case (t, i) => typeJson(t, s"a$i") }.mkString(",")
      }]}]"""
      val selector = Keccak256.selector(
        "f" + types.map(canonical).mkString("(", ",", ")"))
      val data = encodeSeq(types.zip(values))
      val callData = "0x" + selector + data.map("%02x".format(_)).mkString
      val got = Abi.decodeInput(abi, callData)
      assert(got.isDefined, s"seed=$seed: decode failed for ${types.map(canonical)}")
      assert(got.get.name === "f")
      assert(got.get.params.map(_.`type`) === types.map(canonical),
        s"seed=$seed type mismatch")
      val expected = types.zip(values).map { case (t, v) => render(t, v) }
      assert(got.get.params.map(_.value) === expected,
        s"seed=$seed value mismatch for ${types.map(canonical)}")
    }
  }
}
