package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.labelers.{FastMatch, RegexLabeler}

/** Guard-drift gate: [[RegexLabeler.labelOfRegex]] — the GUARDED rlike
  * chain — must equal [[FastMatch.label]] (itself property-equivalent to
  * the raw pattern chain via FastMatchSpec). A guard that stops being a
  * necessary condition of its patterns silently turns matching cells
  * into UNKNOWN in the guarded chain only; FastMatchSpec cannot see
  * that because it never evaluates guards. Inputs deliberately include
  * every rule's length BOUNDARY (the round-9 miss: a 24-char
  * internationally-grouped phone vs a 19-char guard cap) and trailing
  * line terminators (Java's `$` matches before a final \n or \r\n, so
  * matching cells run up to 2 bytes past each pattern's own maximum —
  * the guards' documented +2 allowance). */
class RegexGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val boundary: Seq[String] = Seq(
    // the advisor's counterexample class: grouped-international phone at
    // the 24-char pattern maximum
    "+999 7946-0958 7946-0958",
    "+999 7946-0958 7946-095",
    "+12 34-56", "+1234567", "+123456789012345",
    "(555) 123-4567", "+1 (555) 123-4567", "1.555.123.4567",
    // dates/times at short and long edges
    "1/2/2024", "12/31/2024", "2024-01-02", "31.12.2024",
    "1 may 2024", "12 september 2024", "september 12, 2024",
    "0:00", "23:59:59", "9:00 am", "11:59:59 pm", "07h30",
    "2024-01-02T3:30", "2024-01-02 23:59:59Z", "1/2/2024 9:00 am",
    // exact-length families
    "123-45-6789", "123456789", "123 45 6789",
    "4111 1111 1111 1111", "4111111111111111", "341111111111111",
    "00:11:22:33:44:55", "00-11-22-33-44-55",
    "0.0.0.0", "255.255.255.255", "1.2.3.4",
    "123e4567-e89b-12d3-a456-426614174000",
    "{123e4567-e89b-12d3-a456-426614174000}",
    "d41d8cd98f00b204e9800998ecf8427e",
    "da39a3ee5e6b4b0d3255bfef95601890afd80709",
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
    "1234567890", "123456789012345678",
    "CA", "TX", "california", "south carolina", "new hampshire",
    "A1234567", "AB123456789012",
    "12 Main St.", "12 Ocean View Blvd", "John Smith", "John Q. Smith",
    "12 kg", "12.5 mph", "$1,234.56", "$.5",
    "1st", "22nd", "103rd",
    "user@example.com", "a@b.co", "http://a.b:80/x", "www.a.bc/p",
    "a.example.com", "x.yz:8080/q",
    "::", "fe80::1", "1:2:3:4:5:6:7:8",
    "42", "-42", "3.14", "1e9", "+0.5e-3",
    "", " ", "hello world", "not a label at all")

  test("guarded chain equals FastMatch on boundary and terminator inputs") {
    import spark.implicits._
    val inputs = (boundary ++
      boundary.map(_ + "\n") ++
      boundary.map(_ + "\r\n") ++
      boundary.map(_ + "\r") ++
      boundary.map(_ + " ")).distinct
    val got = inputs.toDF("cell")
      .select(col("cell"), RegexLabeler.labelOfRegex(col("cell")).as("l"))
      .collect()
    assert(got.length == inputs.length)
    got.foreach { r =>
      val cell = r.getString(0)
      val want = FastMatch.label(cell)
      assert(r.getString(1) == want,
        s"guard drift on ${cell.map(c => f"\\u${c.toInt}%04x").mkString} " +
          s"(${cell.take(40)}): guarded=${r.getString(1)} fast=$want")
    }
  }

  test("guarded chain equals FastMatch on random separator-heavy strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val chars = "0123456789-.:/@ aApPmMeEsTndrth+()%wW"
    val inputs = (0 until 3000).map { _ =>
      val n = rnd.nextInt(26)
      val s = (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
      if (rnd.nextInt(4) == 0) s + (if (rnd.nextBoolean()) "\n" else "\r\n")
      else s
    }.distinct
    val got = inputs.toDF("cell")
      .select(col("cell"), RegexLabeler.labelOfRegex(col("cell")).as("l"))
      .collect()
    got.foreach { r =>
      val cell = r.getString(0)
      val want = FastMatch.label(cell)
      assert(r.getString(1) == want,
        s"guard drift on ${cell.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"guarded=${r.getString(1)} fast=$want")
    }
  }
}
