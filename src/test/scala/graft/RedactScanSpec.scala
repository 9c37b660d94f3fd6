package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.RedactScan

/** RedactScan's char-walk matchers must replicate the java.util.regex
  * chain the redact operator used (and the DuckDB oracle still runs):
  * counts per pattern on the original text, plus codepoint length after
  * chained priority replacement. */
class RedactScanSpec extends AnyFunSuite {

  /** Deterministic sampler (raw scalacheck — no scalatestplus bridge in
    * the offline dependency set), same pattern as FastMatchSpec. */
  private def run(g: Gen[String], n: Int, seed: Long = 0x7ed5L): Unit = {
    val params = Gen.Parameters.default.withSize(40)
    var s = Seed(seed)
    var i = 0
    while (i < n) {
      g.apply(params, s).foreach(check)
      s = s.next
      i += 1
    }
  }

  private val rules = Seq(
    "EMAIL_ADDRESS" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "PHONE_NUMBER" -> "\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}",
    "CREDIT_CARD" -> "[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{4}",
    "SSN" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}")
  private val compiled = rules.map { case (l, p) =>
    (l, java.util.regex.Pattern.compile(p))
  }

  private def reference(s: String): Array[Long] = {
    val counts = compiled.map { case (_, p) =>
      val m = p.matcher(s)
      var c = 0L
      while (m.find()) c += 1
      c
    }
    val red = compiled.foldLeft(s) { case (cur, (l, p)) =>
      p.matcher(cur).replaceAll(
        java.util.regex.Matcher.quoteReplacement(s"[$l]"))
    }
    (counts :+ red.codePointCount(0, red.length).toLong).toArray
  }

  private def check(s: String): Unit =
    assert(RedactScan.scan(s).toSeq == reference(s).toSeq, s"input: '$s'")

  test("hand-picked corpus and edge cases") {
    Seq(
      "",
      "plain text with no pii at all",
      "a@b.co",
      "x@y.c",                        // TLD too short
      "user.name+tag@sub.domain.org trailing",
      "a@@b.co double at",
      "a@b.c9 digits end the TLD",
      "a@b.co.uk multi dot",
      "a@b.corp999 TLD run stops at digit",
      "no local @b.co",
      "-@b.co % @x.yz",
      "(303) 555-0123",
      "(30) 555-0123 short",
      "4111 1111 1111 1111",
      "94111 1111 1111 1111 leading extra digit",
      "123-45-6789",
      "order 7 contact user3@example.com phone (303) 555-0003 ssn " +
        "121-13-4003 card 4111 1111 1111 1111",
      "ssn inside phone (123) 456-7890 overlap 123-45-6789",
      "email then ssn a@b.co123-45-6789",
      "unicode ✓ 漢字 a@b.co 𝒳𝒴 (303) 555-0123 𝄞",
      "a@b.co@c.de chained ats",
      "a.b.c@d.e.f.gh dots everywhere",
      "1234 5678 9012 3456 7890 run of five groups",
      "111-22-3333-44-5555 ssn chain").foreach(check)
  }

  test("property: random pii-shaped soup matches the regex chain") {
    val atom = Gen.oneOf(
      Gen.oneOf("a@b.co", "x@y.zw", "user3@example.com", "a@b.c",
        "@b.co", "a@", "a@b.", "a@b.co.uk", "a@b.c0m"),
      Gen.oneOf("(303) 555-0123", "(30) 55-012", "303) 555-0123"),
      Gen.oneOf("4111 1111 1111 1111", "411 1111 1111 1111",
        "41111 1111 1111 1111"),
      Gen.oneOf("123-45-6789", "12-345-6789", "123-456-789"),
      Gen.oneOf(" ", "", ".", "-", "+", "%", "_", "@", "(", ")", "9",
        "ab", "Z", "✓", "漢", "𝒳"))
    val soup = Gen.listOfN(12, atom).map(_.mkString)
    run(soup, 500)
  }
}
