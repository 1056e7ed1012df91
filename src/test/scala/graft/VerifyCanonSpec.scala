package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Verify.canonDouble]] to the EXACT strings
  * `tools/check_oracle.py`'s `canon_double` produces for the same
  * doubles (goldens computed by running the Python side — see the
  * value list; both sides now seed from the exact IEEE-754 binary
  * expansion, `new BigDecimal(d)` / `Decimal(float)`, so equality is
  * by construction on ANY JDK — the round-12 ADVICE fix for
  * JDK-4511638's non-shortest `Double.toString` on JDK < 19).
  * If either side's quantization drifts, this golden splits. */
class VerifyCanonSpec extends AnyFunSuite {

  test("canonDouble matches check_oracle.py canon_double on edge doubles (exact-binary seed)") {
    val golden = Seq[(Double, String)](
      0.1 -> "0.1",
      1.0 / 3 -> "0.333333333",
      2.675 -> "2.675",
      1e-10 -> "0",
      1.5e-9 -> "0.000000001",
      2.5e-9 -> "0.000000003",
      0.1234567895 -> "0.123456789",
      0.123456789500001 -> "0.12345679",
      1234567890123445.0 -> "1234567890123440",
      9.007199254740993e15 -> "9007199254740990",
      4.9e-324 -> "0",
      -0.1 -> "-0.1",
      123.456 -> "123.456",
      5.0 -> "5",
      0.3333333335 -> "0.333333333",
      6.62607015e-34 -> "0",
      1e15 -> "1000000000000000",
      // < 1e15 as a double (999999999999999.875), so the 9-dp path —
      // and the exact binary expansion shows through, on BOTH sides
      999999999999999.9 -> "999999999999999.875")
    golden.foreach { case (d, want) =>
      assert(Verify.canonDouble(d) == want,
        s"canonDouble($d) = ${Verify.canonDouble(d)}, python side says $want")
    }
    // max double: 15 significant digits then zeros, no E-notation
    val maxD = Verify.canonDouble(1.7976931348623157e308)
    assert(maxD.startsWith("179769313486232") && maxD.length == 309 &&
      maxD.drop(15).forall(_ == '0'), s"max-double canon wrong: $maxD")
    // specials
    assert(Verify.canonDouble(Double.NaN) == "NaN")
    assert(Verify.canonDouble(Double.PositiveInfinity) == "Infinity")
    assert(Verify.canonDouble(Double.NegativeInfinity) == "-Infinity")
    assert(Verify.canonDouble(-0.0) == "0")
  }
}
