package graft

import graft.streaming.Amqp10
import graft.streaming.Amqp10._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test for the AMQP 1.0 codec: encode∘decode is the identity
  * over a generated value universe (nested lists/maps/described types,
  * unicode strings, arbitrary binaries, all integral widths the decoder
  * accepts). The wire specs exercise the protocol; this pins the codec
  * itself against value-shape corner cases. Plain scalacheck — no
  * scalatestplus bridge in the offline cache (PropertySpec's pattern). */
class Amqp10CodecSpec extends GraftSuite {

  private def check(p: Prop, name: String): scala.Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: $res")
  }

  private def canon(v: V): V = v match {
    case VUByte(n) => VLong(n.toLong) // decoder collapses integral widths
    case VList(xs) => VList(xs.map(canon))
    case VMap(xs) => VMap(xs.map { case (k, x) => (canon(k), canon(x)) })
    case VDesc(d, x) => VDesc(canon(d), canon(x))
    case other => other
  }

  private def eqV(a: V, b: V): Boolean = (a, b) match {
    case (VBin(x), VBin(y)) => java.util.Arrays.equals(x, y)
    case (VList(x), VList(y)) =>
      x.size == y.size && x.zip(y).forall { case (p, q) => eqV(p, q) }
    case (VMap(x), VMap(y)) =>
      x.size == y.size && x.zip(y).forall { case ((k1, v1), (k2, v2)) =>
        eqV(k1, k2) && eqV(v1, v2) }
    case (VDesc(d1, v1), VDesc(d2, v2)) => eqV(d1, d2) && eqV(v1, v2)
    case _ => a == b
  }

  private val leaf: Gen[V] = Gen.oneOf(
    Gen.const(VNull),
    Gen.oneOf(true, false).map(VBool(_)),
    Gen.chooseNum(0, 255).map(VUByte(_)),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(VLong(_)),
    Gen.asciiPrintableStr.map(VSym(_)),
    Gen.oneOf(
      Gen.stringOf(Gen.oneOf(('a' to 'z') ++ "π®éሴ{}\":,".toSeq)),
      Gen.listOfN(300, Gen.alphaNumChar).map(_.mkString)).map(VStr(_)),
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(a => VBin(a.toArray)))

  private def tree(depth: Int): Gen[V] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.listOfN(3, tree(depth - 1)).map(VList(_)),
      2 -> Gen.listOfN(2, Gen.zip(leaf, tree(depth - 1))).map(VMap(_)),
      1 -> Gen.zip(Gen.chooseNum(0L, 255L).map(VLong(_)), tree(depth - 1))
        .map { case (d, x) => VDesc(d, x) })

  test("property: encode then decode is the identity over nested values") {
    check(Prop.forAll(tree(3)) { v =>
      val round = Amqp10.decode(java.nio.ByteBuffer.wrap(Amqp10.encode(v)))
      eqV(round, canon(v))
    }, "amqp10-roundtrip")
  }

  test("decoder rejects unknown type codes instead of misreading") {
    intercept[IllegalArgumentException] {
      Amqp10.decode(java.nio.ByteBuffer.wrap(Array[Byte](0x74, 1, 2, 3)))
    }
  }
}
