package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Punycode/IDNA: round-trip property on random Unicode labels,
  * cross-validation against java.net.IDN in both directions, and
  * strict rejection of malformed ACE.
  */
class PunySpec extends AnyFunSuite {

  private val aceHosts = Seq(
    "xn--mnchen-3ya.de", "xn--bcher-kva.example", "xn--fiqs8s",
    "xn--80akhbyknj4f.example", "xn--caf-dma.shop", "xn--nxasmq6b.example",
    "xn--egbpdaj6bu4bxfgehfvwxn.example", "www.example.com")

  test("decodeHost matches java.net.IDN.toUnicode on the ACE corpus") {
    for (h <- aceHosts)
      assert(Puny.decodeHost(h) == java.net.IDN.toUnicode(h), h)
  }

  test("encodeHost matches java.net.IDN.toASCII on the display corpus") {
    for (h <- aceHosts) {
      val display = java.net.IDN.toUnicode(h)
      assert(Puny.encodeHost(display) == java.net.IDN.toASCII(display), h)
    }
  }

  test("decode(encode(label)) round-trips random BMP labels") {
    var s = 20260820
    def rnd(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    for (_ <- 0 until 200) {
      val len = 1 + rnd() % 12
      val label = (0 until len).map { _ =>
        rnd() % 4 match {
          case 0 => ('a' + rnd() % 26).toChar
          case 1 => (0xe0 + rnd() % 0x1f).toChar  // latin-1 letters
          case 2 => (0x3b1 + rnd() % 24).toChar   // greek
          case _ => (0x4e00 + rnd() % 1000).toChar // cjk
        }
      }.mkString
      assert(Puny.decodeLabel(Puny.encodeLabel(label)) == label, label)
    }
  }

  test("mixed host: only xn-- labels decode, case folds") {
    assert(Puny.decodeHost("WWW.XN--MNCHEN-3YA.DE") == "www.münchen.de")
    assert(Puny.decodeHost("plain.example") == "plain.example")
  }

  test("malformed ACE rejects cleanly") {
    intercept[IllegalArgumentException] { Puny.decodeLabel("mnchen-3y!") }
    intercept[IllegalArgumentException] { Puny.decodeLabel("-") ; () }
    // truncated variable-length integer
    intercept[IllegalArgumentException] { Puny.decodeLabel("mnchen-3") }
  }
}
