package graft

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.labelers.{FastMatch, RegexLabeler}

/** Property-check: [[FastMatch.label]] is EXACTLY the regex priority
  * chain (java.util.regex `find` over [[RegexLabeler.rules]], first rule
  * with any matching pattern wins, else UNKNOWN). The generators are
  * adversarial: entity-shaped strings, single-char mutations of them,
  * skewed separator-heavy alphabets, and trailing-line-terminator cases
  * that exercise the `$`-before-final-newline quirk.
  */
class FastMatchSpec extends AnyFunSuite {

  /** Deterministic sampler (raw scalacheck — no scalatestplus bridge in
    * the offline dependency set): n samples from g, fixed seed chain. */
  private def run(g: Gen[String], n: Int, seed: Long = 0x6157L): Unit = {
    val params = Gen.Parameters.default.withSize(40)
    var s = Seed(seed)
    var i = 0
    while (i < n) {
      g.apply(params, s).foreach(check)
      s = s.next
      i += 1
    }
  }

  /** The ground truth FastMatch must reproduce: the actual compiled
    * patterns, evaluated exactly as Spark's rlike does (Matcher.find). */
  private val compiled: Seq[(String, Seq[Pattern])] =
    RegexLabeler.rules.map(r => r.label -> r.patterns.map(Pattern.compile))

  private def regexLabel(s: String): String =
    compiled.collectFirst {
      case (l, ps) if ps.exists(_.matcher(s).find()) => l
    }.getOrElse("UNKNOWN")

  private def check(s: String): Unit = {
    val want = regexLabel(s)
    val got = FastMatch.label(s)
    assert(got == want, s"input ${s.map(c => f"\\u${c.toInt}%04x").mkString} " +
      s"(${s.take(60)}): fast=$got regex=$want")
  }

  // ------------------------------------------------------------ generators
  private val digits = Gen.numStr.suchThat(_.nonEmpty)
  private def nDigits(n: Int) = Gen.listOfN(n, Gen.numChar).map(_.mkString)

  private val entityGen: Gen[String] = Gen.oneOf(
    // dates / times
    for (y <- nDigits(4); m <- nDigits(2); d <- nDigits(2))
      yield s"$y-$m-$d",
    for (m <- Gen.choose(1, 31); d <- Gen.choose(1, 12); y <- nDigits(4))
      yield s"$m/$d/$y",
    for (h <- Gen.choose(0, 99); m <- nDigits(2); ap <- Gen.oneOf("", "am", " pm", " AM", "Pm"))
      yield s"$h:$m$ap",
    for (h <- Gen.choose(0, 99); m <- nDigits(2); sec <- nDigits(2)) yield s"$h:$m:$sec",
    for (date <- nDigits(8); t <- Gen.oneOf(" ", "T", "x"); h <- Gen.choose(1, 12))
      yield s"${date.take(4)}-${date.slice(4, 6)}-${date.drop(6)}$t$h:30",
    for (d <- Gen.choose(1, 31); mon <- Gen.oneOf("jan", "Feb", "MARCH", "sept", "mayhem", "dec"); y <- nDigits(4))
      yield s"$d $mon $y",
    for (mon <- Gen.oneOf("jan", "July", "AUGUST", "octo"); d <- Gen.choose(1, 31);
         c <- Gen.oneOf("", ","); y <- nDigits(4)) yield s"$mon $d$c $y",
    // email / url
    for (u <- Gen.alphaNumStr; d <- Gen.alphaNumStr; t <- Gen.alphaStr)
      yield s"$u@$d.$t",
    Gen.oneOf("user@example.com", "a@b.co", "a@b.c", "@b.com", "a@.com",
      "a@b..com", "a b@c.de", "a@b.c2m", "user.name+tag@sub.domain.org"),
    for (sch <- Gen.oneOf("http", "https", "ftp", "HTTP", "htt");
         h <- Gen.oneOf("example.com", "a", "a.b-c.d", "");
         p <- Gen.oneOf("", ":8080", ":x", "/path/x?q=1", "/ sp", "/p q"))
      yield s"$sch://$h$p",
    for (h <- Gen.oneOf("example.com", "foo", "a.b", "x.yz");
         p <- Gen.oneOf("", "/p", "/p p")) yield s"www.$h$p",
    // uuid / mac / hash / ip
    Gen.uuid.map(_.toString),
    Gen.uuid.map(_.toString.toUpperCase),
    Gen.uuid.map(_.toString.replace('-', ':')),
    for (n <- Gen.oneOf(31, 32, 33, 40, 64); c <- Gen.listOfN(n, Gen.hexChar))
      yield c.mkString,
    for (g <- Gen.listOfN(6, Gen.listOfN(2, Gen.hexChar).map(_.mkString));
         sep <- Gen.oneOf(":", "-")) yield g.mkString(sep),
    for (a <- Gen.choose(0, 300); b <- Gen.choose(0, 260); c <- Gen.choose(0, 99);
         d <- Gen.choose(0, 256)) yield s"$a.$b.$c.$d",
    Gen.oneOf("0.0.0.0", "255.255.255.255", "256.1.1.1", "01.2.3.4",
      "1.2.3", "1.2.3.4.5", "10.00.1.1"),
    Gen.oneOf("::", ":::", "::1", "1::", "a::b", "a:b::c:d", ":abc",
      "1:2:3:4:5:6:7:8", "1:2:3:4:5:6:7", "1:2:3:4:5:6:7:8:9",
      "abcd:ef01:2345:6789:abcd:ef01:2345:6789", "g::1", "12345::a", "a::b::c"),
    // ssn / phone / card
    for (a <- nDigits(3); b <- nDigits(2); c <- nDigits(4)) yield s"$a-$b-$c",
    for (pre <- Gen.oneOf("", "1-", "+1 ", "+1.", "1 ", "+2-");
         a <- Gen.oneOf("(555)", "555", "(55)", "5555");
         s1 <- Gen.oneOf("-", ".", " ", "");
         b <- nDigits(3); s2 <- Gen.oneOf("-", ".", " ");
         c <- nDigits(4)) yield s"$pre$a$s1$b$s2$c",
    for (n <- Gen.choose(5, 18); d <- Gen.listOfN(n, Gen.numChar))
      yield "+" + d.mkString,
    for (g <- Gen.listOfN(4, nDigits(4)); s1 <- Gen.oneOf("-", " "); s2 <- Gen.oneOf("-", " ");
         s3 <- Gen.oneOf("-", " ")) yield
      s"${g(0)}$s1${g(1)}$s2${g(2)}$s3${g(3)}",
    // numeric
    for (n <- Gen.choose(1, 20); d <- Gen.listOfN(n, Gen.numChar)) yield d.mkString,
    for (sg <- Gen.oneOf("", "+", "-"); a <- digits; b <- Gen.numStr)
      yield s"$sg$a.$b",
    for (sg <- Gen.oneOf("", "+", "-"); a <- digits; e <- Gen.oneOf("e", "E");
         es <- Gen.oneOf("", "+", "-"); x <- digits) yield s"$sg$a$e$es$x",
    Gen.oneOf(".5", "5.", "1.2e3", "1.e5", "1e5", "1e", "e5", "+.5e-2", "1.2.3"),
    for (d <- digits; sfx <- Gen.oneOf("st", "nd", "rd", "th", "ST", "xd"))
      yield s"$d$sfx",
    for (d <- Gen.choose(0, 999); f <- Gen.oneOf("", ".5", "."); sp <- Gen.oneOf("", " ");
         u <- Gen.oneOf("kg", "KG", "lbs", "%", "xyz", "gal", "l"))
      yield s"$d$f$sp$u",
    // state / license / address / person
    Gen.oneOf("CA", "ca", "Ca", "TX", "ZZ", "DC", "texas", "Texas", "TEXAS",
      "new york", "New York", "norTH dakota", "puerto rico", "Wyo"),
    for (l <- Gen.alphaUpperChar; n <- Gen.choose(6, 13); d <- Gen.listOfN(n, Gen.numChar))
      yield s"$l${d.mkString}",
    for (n <- digits; mid <- Gen.oneOf("Main", "Elm spruce", "5th", "a.b", "");
         sfx <- Gen.oneOf("St", "st.", "Street", "AVE", "Way", "xx");
         tail <- Gen.oneOf("", ".", "..")) yield s"$n $mid $sfx$tail",
    for (a <- Gen.oneOf("John", "john", "J", "JOhn"); m <- Gen.oneOf("", "Q. ", "Q.", "Q ");
         b <- Gen.oneOf("Smith", "smith", "S")) yield
      (if (m.isEmpty) s"$a $b" else s"$a $m$b"),
    // round-9 rule additions: braced uuids, dotted dates, 'h' times,
    // iso-Z datetimes, any-separator ssn/cards, money, schemeless urls,
    // grouped international phones, 2-letter licenses
    Gen.uuid.map(u => s"{$u}"),
    Gen.oneOf("{not-a-uuid}", "{12345678-1234-1234-1234-1234567890}",
      "28.12.2021", "1.2.2021", "28.12.21", "1.2.3.2021", "07h30",
      "7H05", "107h30", "7h3", "2023-01-02T10:30:00Z", "2023-01-02 10:30Z",
      "1/2/2020 10:30Z"),
    for (a <- nDigits(3); s1 <- Gen.oneOf("-", " ", ".", "/", "x");
         b <- nDigits(2); s2 <- Gen.oneOf("-", " ", ".", "/");
         c <- nDigits(4)) yield s"$a$s1$b$s2$c",
    for (n <- Gen.oneOf(8, 9, 10)) yield "7" * n,
    for (g <- Gen.listOfN(4, nDigits(4)); sp <- Gen.oneOf("/", ".", "_", "x"))
      yield g.mkString(sp),
    Gen.oneOf("341234567890123", "371234567890123", "351234567890123",
      "34123456789012", "3412345678901234"),
    for (sg <- Gen.oneOf("", "+", "-"); body <- Gen.oneOf("5", "1,234",
         "1,234.56", "1,2,3,", ".99", "5.", "12,34", ",5", "5,"))
      yield s"$$$sg$body",
    for (h <- Gen.oneOf("example.com", "a.b.co", "x.y", "foo.toolong7",
         "1.2.3.4", "a-b.de", "a..de");
         p <- Gen.oneOf("", ":8080", ":x", "/p", "/p p"))
      yield s"$h$p",
    for (cc <- Gen.oneOf("+1", "+44", "+999", "+4444");
         gs <- Gen.listOf(Gen.oneOf(" 20", " 7946", "-0958", ".12345", " 1"))
           .map(_.take(5))) yield cc + gs.mkString,
    for (l1 <- Gen.alphaUpperChar; l2 <- Gen.alphaUpperChar;
         n <- Gen.choose(5, 13); d <- Gen.listOfN(n, Gen.numChar))
      yield s"$l1$l2${d.mkString}",
    // r15 holdout-probe rule additions: named-month datetimes,
    // fractional-second timestamps, yyyy/m/d + dd-Mon-yyyy dates,
    // military 'hrs' times, dotted MACs, v4-mapped IPv6, unit-suffixed
    // addresses, traditional state abbreviations
    for (mon <- Gen.oneOf("Mar", "july", "AUGUST", "octo", "mayhem");
         d <- Gen.choose(1, 31); c1 <- Gen.oneOf("", ",");
         c2 <- Gen.oneOf("", ","); h <- Gen.choose(0, 23); m <- nDigits(2);
         ap <- Gen.oneOf("", " PM", "am")) yield s"$mon $d$c1 2023$c2 $h:$m$ap",
    for (f <- Gen.oneOf("1", "123", "123456789", "1234567890", "");
         z <- Gen.oneOf("", "Z")) yield s"2023-10-13 21:40:00.$f$z",
    for (y <- nDigits(4); m <- Gen.choose(1, 19); d <- Gen.choose(1, 31))
      yield s"$y/$m/$d",
    for (d <- Gen.choose(1, 31); mon <- Gen.oneOf("Mar", "sep", "SEPT", "xyz");
         y <- nDigits(4)) yield s"$d-$mon-$y",
    for (h <- Gen.oneOf("00", "09", "19", "23", "24", "7");
         m <- Gen.oneOf("00", "59", "61"); sp <- Gen.oneOf("", " ");
         u <- Gen.oneOf("hrs", "hr", "HRS", "h", "hrss"))
      yield s"$h$m$sp$u",
    for (g <- Gen.listOfN(3, Gen.listOfN(4, Gen.hexChar).map(_.mkString));
         sep <- Gen.oneOf(".", ":")) yield g.mkString(sep),
    for (a <- Gen.choose(0, 300); b <- Gen.choose(0, 260);
         pre <- Gen.oneOf("::ffff:", "::FFFF:", "::fff:", ":ffff:"))
      yield s"$pre$a.$b.1.2",
    for (n <- digits; sfx <- Gen.oneOf("St", "Street", "Ave");
         kw <- Gen.oneOf("Suite", "STE", "Apt", "Unit", "No", "Extra");
         dot <- Gen.oneOf("", "."); sp <- Gen.oneOf("", " ");
         id <- Gen.oneOf("4", "133", "4B", "#4", ""))
      yield s"$n Main $sfx $kw$dot$sp$id",
    Gen.oneOf("Calif.", "calif.", "CALIF.", "Calif", "Penn.", "n.y.",
      "N.Y.", "w.va.", "d.c.", "Tex.", "Texas.", "mo.", "no.", "la.",
      "ore.", "zz."))

  private val sepAlphabet: Gen[String] = {
    val chars = Gen.oneOf("0123456789-.:/@ aApPmMeEsTndrth+()%wW\n\r".toSeq)
    for (n <- Gen.choose(0, 24); cs <- Gen.listOfN(n, chars)) yield cs.mkString
  }

  private val mutated: Gen[String] = for {
    base <- entityGen
    if base.nonEmpty
    pos <- Gen.choose(0, base.length - 1)
    c <- Gen.oneOf("0a-.:/@ Z\n".toSeq)
    mode <- Gen.choose(0, 2)
  } yield mode match {
    case 0 => base.updated(pos, c)
    case 1 => base.take(pos) + c + base.drop(pos)
    case _ => base.take(pos) + base.drop(pos + 1)
  }

  private val withTerminator: Gen[String] = for {
    base <- Gen.oneOf(entityGen, mutated)
    t <- Gen.oneOf("\n", "\r", "\r\n", "", " ", " ", "\n\n")
  } yield base + t

  test("entity-shaped strings") {
    run(entityGen, 3000)
  }

  test("single-char mutations of entity strings") {
    run(mutated, 3000, seed = 2)
  }

  test("separator-heavy random strings") {
    run(sepAlphabet, 3000, seed = 3)
  }

  test("arbitrary unicode strings") {
    run(Gen.asciiPrintableStr, 1000, seed = 4)
    run(implicitly[org.scalacheck.Arbitrary[String]].arbitrary, 1000, seed = 5)
  }

  test("trailing line terminators (the $ quirk)") {
    run(withTerminator, 2000, seed = 6)
    check("123\n"); check("123\r\n"); check("123\r"); check("123\n\n")
    check("2024-01-02\n"); check("user@example.com\r\n"); check("CA ")
  }

  test("generators exercise (nearly) the whole label vocabulary") {
    val params = Gen.Parameters.default.withSize(40)
    var s = Seed(1L)
    val seen = scala.collection.mutable.Set[String]()
    for (_ <- 1 to 6000) {
      entityGen.apply(params, s).foreach(x => seen += regexLabel(x))
      s = s.next
    }
    // 22 non-PAD labels exist; the generators must light up at least 20
    assert(seen.size >= 20, s"only ${seen.size} labels covered: $seen")
  }

  test("fixed corner cases") {
    Seq("", " ", "::", ":", ":abc", "abc:", "0", "00", "+", "-", ".",
      "1.", ".1", "Jan 1, 2020", "1 jan 2020", "12 JANUARY 1999",
      "may 5 2020", "mayx 5 2020", "1:23", "23:59:59", "9:00 am", "9:00am",
      "9:00  am", "12 kg", "12kg", "12 KG", "12 kgx", "1-23", "12 st",
      "12  st", "12 main st", "12 Main St.", "12 Main Stx.", "John Smith",
      "John Q. Smith", "John Q Smith", "A1234567", "A123456789012x",
      "http://a.b:80", "http://a.b:80/", "http://a.b:x", "www.a.bc",
      "www.a.bc/ x", "WWW.FOO.COM", "HtTpS://X.y/Z", "911", "011-23-4567",
      "(555) 123-4567", "+1 (555) 123-4567", "1.555.123.4567",
      "5550123456", "55501234567890123", "123-45-6789", "987-65-4321x",
      // r15 rule additions
      "Mar 13, 2023 5:40 PM", "Mar 13 2023, 5:40 am", "mar 5, 2023 25:40",
      "2023-10-13 21:40:00.123", "2023-10-13T21:40:00.123456789Z",
      "2023-10-13 21:40:00.", "2023-10-13 21:40.5", "2021/10/22",
      "2021/1/2", "12345/1/2", "20-Mar-2014", "20-mArCh-2014", "20-xyz-2014",
      "0101 hrs", "2359hrs", "0101 hr", "2401 hrs", "0161 hrs", "0101 hrss",
      "001b.4422.66ee", "001B.4422.66EE", "001b.4422.66e", "001g.4422.66ee",
      "::ffff:1.2.3.4", "::FFFF:10.0.0.1", "::ffff:256.1.1.1", "::fff:1.2.3.4",
      "133 N Elm St Suite 133", "10 Main St Apt 4B", "10 Main St. Unit #7",
      "10 Main St Suite", "10 Main Street no4", "10 Main St Extra 4",
      "Calif.", "Penn.", "n.y.", "w.va.", "D.C.", "zz.", "no.", "Calif",
      "N 1000013", "a9876543")
      .foreach(check)
  }

  test("r17 tier-five rule additions") {
    Seq(
      // RFC 2822 datetimes + near-misses
      "Tue, 13 Jul 2020 16:40:00 +0200", "tue, 1 jul 2020 6:40 -0000",
      "Wed, 05 January 2021 10:30 GMT", "Thu, 5 Aug 2021 23:59 utc",
      "Fri, 5 Aug 2021 23:59 UT", "Sat, 5 Aug 2021 23:59 z",
      "Sun, 5 Aug 2021 23:59:59", "Sun, 5 Aug 2021 1:30 pm +0000",
      "Mon, 5 Aug 2021 23:59 +020", "Mon, 5 Aug 2021 23:59 +02000",
      "Mon 5 Aug 2021 23:59 +0200", "Xue, 5 Aug 2021 23:59 +0200",
      "Tue, 5 Xyz 2021 23:59 +0200", "Tue, 567 Aug 2021 23:59",
      "Tue, 5 Aug 21 23:59", "Tue, 5 Aug 2021 23:59 pst",
      "Tue, 5 Aug 2021 23:59Z", "Tue, 5 Aug 2021",
      // accounting negatives + near-misses
      "(6,285)", "(1,234,567)", "(123,456)", "(1234,567)", "(12,3456)",
      "(5)", "(6,285", "6,285)", "(6,28)", "(6.285)", "(-6,285)",
      // spaced + electronic IBANs and near-misses
      "GB29 NWBK 6016 1331 9268 19", "DE89 3704 0044 0532 0130 00",
      "FR14 2004 1010 0505 0001 3M02 606", "GB29 NWBK 6016",
      "GB29 NWBK", "gb29 nwbk 6016 1331", "GB29 NWBKX 6016 1331",
      "GB29NWBK60161331926819", "GB2 NWBK 6016 1331", "AB123456789012",
      "GB29 NWBK 6016 1331 9268 198", "GB29 nwbk 6016 1331",
      // full European floats + near-misses
      "1.100,10", "-12.345.678,99", "+1.100,1", "1234.100,10",
      "1.1000,10", "1.100,", "1.100.10", "1,100.10", "1.100",
      // mailto URIs
      "mailto:jane.doe3@ex3.co.uk", "MAILTO:a@b.co", "mailto:a@b",
      "mailto:@b.co", "mailto:a@b.co.", "xmailto:a@b.co",
      // word ordinals + near-misses
      "first", "Second", "THIRD", "fourth", "twenty-first",
      "thirty-second", "forty-third", "ninety-ninth", "twelfth",
      "hundredth", "ninetieth", "firsts", "twenty-tenth", "ten-first",
      "twenty first", "twentyfirst", "fifth-", "-first", "oneth",
      // Sq/Cres addresses + comma unit tails
      "12 Maple Sq", "40 Oak Cres, Unit 3", "40 Oak Cres Unit 3",
      "9 King Square", "7 Round Crescent", "40 Oak Cres,", "12 Sq",
      "40 Oak Cres, 3", "10 Main St, Suite 4B", "10 Main St., Apt 9",
      "40 Oak Crescent, Floor 2", "40 Oak Cresc, Unit 3")
      .foreach(check)
    Seq("\n", "\r\n", " ").foreach { t =>
      check("Tue, 13 Jul 2020 16:40:00 +0200" + t)
      check("(6,285)" + t); check("1.100,10" + t)
      check("twenty-first" + t); check("GB29 NWBK 6016 1331 9268 19" + t)
    }
  }

  private val tierFiveGen: Gen[String] = Gen.oneOf(
    // RFC 2822-shaped with mutating zone/seconds/weekday
    for (w <- Gen.oneOf("Mon", "tue", "WED", "Xyz", "Monday");
         d <- Gen.choose(1, 39); mon <- Gen.oneOf("Jul", "aug", "SEPT", "xyz");
         y <- Gen.oneOf("2020", "21", "20211"); h <- Gen.choose(0, 29);
         m <- Gen.oneOf("05", "59", "5");
         sec <- Gen.oneOf("", ":00", ":61", ":0");
         z <- Gen.oneOf("", " +0200", " -0000", " +020", " GMT", " utc",
           " UT", " z", " PST", "Z"))
      yield s"$w, $d $mon $y $h:$m$sec$z",
    // accounting-negative shaped
    for (a <- Gen.choose(1, 12345); gs <- Gen.listOf(Gen.oneOf("000", "285",
         "28", "2856")).map(_.take(3)); o <- Gen.oneOf("(", ""); c <- Gen.oneOf(")", ""))
      yield s"$o$a${gs.map("," + _).mkString}$c",
    // IBAN-shaped
    for (cc <- Gen.oneOf("GB", "DE", "gb", "G1"); k <- Gen.oneOf("29", "8", "123");
         gs <- Gen.listOf(Gen.oneOf("NWBK", "6016", "1331", "9268", "19", "3M02",
           "nwbk", "60167")).map(_.take(8)))
      yield s"$cc$k${gs.map(" " + _).mkString}",
    // euro-float shaped
    for (sg <- Gen.oneOf("", "+", "-"); a <- Gen.choose(1, 12345);
         gs <- Gen.listOf(Gen.oneOf("100", "345", "67", "4567")).map(_.take(3));
         dec <- Gen.oneOf("10", "1", "", "105"))
      yield s"$sg$a${gs.map("." + _).mkString},$dec",
    // word-ordinal shaped
    for (t <- Gen.oneOf("twenty", "thirty", "ninety", "ten", "twelf", "");
         sep <- Gen.oneOf("-", " ", "");
         u <- Gen.oneOf("first", "second", "ninth", "tenth", "teenth", "th"))
      yield if (t.isEmpty) u else s"$t$sep$u",
    // sq/cres address shaped
    for (n <- digits; mid <- Gen.oneOf("Maple", "Oak Hill", "");
         sfx <- Gen.oneOf("Sq", "Square", "Cres", "Crescent", "Cresc", "sq.");
         tail <- Gen.oneOf("", ",", ", Unit 3", ", Unit", " Unit 3", ",Unit 3",
           ", Suite #4B", ". Unit 3", ",. Unit 3"))
      yield s"$n $mid $sfx$tail",
    // mailto-shaped
    for (sch <- Gen.oneOf("mailto:", "MAILTO:", "mail to:", "");
         u <- Gen.oneOf("a.b", "x", ""); d <- Gen.oneOf("b.co", "b", "b.c"))
      yield s"$sch$u@$d")

  test("r17 tier-five generated neighborhoods") {
    run(tierFiveGen, 4000, seed = 17)
    run(tierFiveGen.flatMap(b => Gen.oneOf("\n", "\r\n", " ", "x", "")
      .map(b + _)), 2000, seed = 18)
  }

  test("r18 tier-six rule additions") {
    Seq(
      // ISO week dates + near-misses
      "2021-W18-4", "2023-W01", "2020-W53-7", "2021-W54-4", "2021-W00",
      "2021-w18-4", "2021-W18-8", "2021-W18-0", "2021-W184", "21-W18-4",
      // asctime datetimes + near-misses
      "Sat May 13 16:40:00 UTC 2020", "Mon Jan  1 0:05:00 2023",
      "sun dec 31 23:59:59 gmt 1999", "Tue Jul 4 12:00:00 +0530 2021",
      "Wed Aug 9 7:30:00 CEST 2022", "Thu Sep 1 10:20:30 z 2020",
      "Fri Oct 2 10:20 2020", "Sat May 13 16:40:00 UTCX 2020",
      "Xat May 13 16:40:00 UTC 2020", "Sat Xyz 13 16:40:00 UTC 2020",
      "Sat May 13 16:40:00 UTC 20", "Sat May 13 16:40:00 ABCDEF 2020",
      // Diners 14-digit PANs + near-misses
      "36123456789012", "30012345678901", "30512345678901",
      "38123456789012", "31123456789012", "3612345678901",
      "361234567890123", "46123456789012", "30612345678901",
      // accounting decimals + near-misses
      "(1,100.10)", "(6,285.99)", "(1,234,567.05)", "(5.25)", "(1100.10)",
      "(1,100.10", "1,100.10)", "(1,100.)", "(1,100,10)", "(12345,100.10)",
      // (at)/(dot) obfuscated emails + near-misses
      "bob3(at)ex1(dot)org", "a.b+c(AT)sub-1(DOT)co(dot)uk",
      "x(at)y(dot)o", "x(at)y(dot)org2", "(at)y(dot)org", "x(at)(dot)org",
      "x(at)y", "x(at)y(dot)", "x(a t)y(dot)org", "x(at)y(dot)or g",
      // roman ordinals + near-misses
      "XXVth", "Ist", "IInd", "IIIrd", "IVth", "IXth", "XLVth", "Mth",
      "xxvth", "XXVTH", "XXVst", "XXVh", "Xth ", "ABCth", "th",
      // currency-code amounts + near-misses
      "10.19 EUR", "5 USD", "1234.5 JPY", "+99.99 GBP", "-3 CHF",
      "10.19 eur", "10.19EUR", "10.19 EURO", "10.19 XYZ", "10. EUR",
      "10.19  EUR", ".5 EUR",
      // DL#-prefixed licenses + near-misses
      "DL# TX 10000000", "DL # CA 123456789", "DL# 12345", "DL#12345",
      "dl# TX 10000000", "DL# tx 10000000", "DL# TX1234567", "DL# T 123456",
      "DL# TX 1234", "DL# TX 12345678901234", "XDL# TX 10000000",
      // SSN#-glued ids + near-misses
      "SSN#123456789", "ssn# 123-45-6789", "SSN 123 45 6789",
      "SSN# 123 45 6789", "ssn#12345678", "SSN#1234567890",
      "SSN#12345678X", "XSSN#123456789", "SSN# 123-456-789",
      // dotless uppercase state abbrevs + near-misses
      "MICH", "MASS", "CALIF", "TENN", "WYO", "CONN", "ORE", "MISS",
      "mich", "Mich", "MICHX", "MI", "M", "TEXAS", "KANS",
      // urn:uuid / GUID= forms + near-misses
      "urn:uuid:0f81d810-9dcd-11d1-b245-5ffdce74fad2",
      "URN:UUID:0F81D810-9DCD-11D1-B245-5FFDCE74FAD2",
      "urn:uuid:00000000-0000-0000-0000-000000000000",
      "GUID={00000000-0000-0000-0000-000000000000}",
      "guid={0f81d810-9dcd-11d1-b245-5ffdce74fad2}",
      "urn:uuid:0f81d810-9dcd-11d1-b245-5ffdce74fad", "urn:uuid:",
      "xrn:uuid:0f81d810-9dcd-11d1-b245-5ffdce74fad2",
      "GUID=00000000-0000-0000-0000-000000000000",
      "GUID={00000000-0000-0000-0000-00000000000}")
      .foreach(check)
    Seq("\n", "\r\n", " ").foreach { t =>
      check("2021-W18-4" + t); check("Sat May 13 16:40:00 UTC 2020" + t)
      check("bob3(at)ex1(dot)org" + t); check("XXVth" + t)
      check("10.19 EUR" + t); check("DL# TX 10000000" + t)
      check("SSN#123456789" + t); check("MICH" + t)
      check("(1,100.10)" + t)
      check("GUID={00000000-0000-0000-0000-000000000000}" + t)
    }
  }

  private val tierSixGen: Gen[String] = Gen.oneOf(
    // ISO-week shaped
    for (y <- Gen.oneOf("2021", "21", "20212"); w <- Gen.choose(0, 60);
         sep <- Gen.oneOf("-W", "-w", "W", "-"); d <- Gen.oneOf("", "-4", "-0", "-8", "4"))
      yield f"$y$sep$w%02d$d",
    // asctime shaped with mutating padding/zone/seconds
    for (w <- Gen.oneOf("Sat", "sun", "XYZ", "Saturday"); mon <- Gen.oneOf("May", "jul", "Xyz");
         pad <- Gen.oneOf(" ", "  ", ""); d <- Gen.choose(1, 39);
         sec <- Gen.oneOf(":00", "", ":0");
         z <- Gen.oneOf("", " UTC", " cest", " z", " +0530", " ABCDEF", " A");
         y <- Gen.oneOf("2020", "20", "20201"))
      yield s"$w $mon$pad$d 16:40$sec$z $y",
    // 14-digit PAN shaped
    for (p <- Gen.oneOf("36", "38", "30", "31", "34"); rest <- nDigits(12))
      yield s"$p$rest".take(14),
    // accounting-decimal shaped
    for (a <- Gen.choose(1, 12345); g <- Gen.oneOf("100", "28", "2856");
         dec <- Gen.oneOf("10", "", "1"); o <- Gen.oneOf("(", ""); c <- Gen.oneOf(")", ""))
      yield s"$o$a,$g.$dec$c",
    // obfuscated-email shaped
    for (u <- Gen.oneOf("bob3", "a.b+c", ""); at <- Gen.oneOf("(at)", "(AT)", "(a t)", "@");
         d <- Gen.oneOf("ex1", "sub-1", ""); dot <- Gen.oneOf("(dot)", "(DOT)", ".");
         t <- Gen.oneOf("org", "o", "org2", ""))
      yield s"$u$at$d$dot$t",
    // roman-ordinal shaped
    for (r <- Gen.oneOf("X", "XXV", "IV", "M", "ABC", "xxv", "");
         sfx <- Gen.oneOf("th", "st", "nd", "rd", "TH", "h"))
      yield s"$r$sfx",
    // currency-amount shaped
    for (sg <- Gen.oneOf("", "+", "-"); a <- Gen.choose(0, 9999);
         dec <- Gen.oneOf("", ".19", "."); sp <- Gen.oneOf(" ", "", "  ");
         c <- Gen.oneOf("EUR", "USD", "eur", "EURO", "XYZ", "KB"))
      yield s"$sg$a$dec$sp$c",
    // DL#/SSN# prefixed shaped
    for (p <- Gen.oneOf("DL# ", "DL #", "dl# ", "SSN#", "ssn # ", "SSN ");
         st <- Gen.oneOf("TX ", "tx ", "T ", ""); n <- digits)
      yield s"$p$st$n",
    // uppercase-abbrev shaped
    Gen.oneOf("MICH", "MASS", "CALIF", "ORE", "MISS", "mich", "MICHI",
      "TEX", "TEXA", "ORE.", "WYO", "WY"),
    // urn/GUID uuid shaped
    for (p <- Gen.oneOf("urn:uuid:", "URN:UUID:", "uuid:", "GUID={", "guid={");
         h <- Gen.oneOf("0f81d810-9dcd-11d1-b245-5ffdce74fad2",
           "00000000-0000-0000-0000-000000000000",
           "0f81d810-9dcd-11d1-b245-5ffdce74fad");
         c <- Gen.oneOf("}", ""))
      yield s"$p$h$c")

  test("r18 tier-six generated neighborhoods") {
    run(tierSixGen, 4000, seed = 23)
    run(tierSixGen.flatMap(b => Gen.oneOf("\n", "\r\n", " ", "x", "")
      .map(b + _)), 2000, seed = 24)
  }

  test("r19 tier-seven rule additions") {
    Seq(
      // ISO ordinal dates + near-misses
      "2021-052", "2023-001", "2020-366", "2021-365", "2021-000",
      "2021-367", "2021-400", "2021-52", "2021-0520", "21-052",
      "2021-05-2", "2021_052",
      // zulu times + near-misses
      "00:00:00Z", "12:30Z", "1:23Z", "23:59:59Z", "12:30z",
      "12:30 Z", "12:30 amZ", "123:00Z", "12:3Z", "12:30:5Z",
      "12:30:55.1Z", ":30Z",
      // SI space-grouped integers + near-misses
      "6 285 365", "1 000", "+12 345", "-1 234 567", "123 456 789",
      "1234 567", "12 34", "6 285 36", "6  285", "6 285 3650",
      "6 285,365", " 285 365",
      // s3:// and friends + near-misses
      "s3://corpus-0/shard=5/part-1000.parquet", "gs://bkt",
      "hdfs://nn:8020/x", "s3a://b/k", "S3://Bucket/Key",
      "file:///etc/passwd", "abfss://c@acct/x", "s3://", "s3:/x",
      "s3//x", "3s://x", "s3://b k/x", "s3://b/k x", "s3://b:x/y",
      // Swiss apostrophe floats + near-misses
      "1'100.10", "12'345.6", "999'000'123.45", "+1'000.5", "1'100",
      "1'1000.10", "1234'100.10", "1'100,10", "1'10.10", "9'9\"",
      "'100.10", "1'100.",
      // masked SSNs + near-misses
      "XXX-XX-1121", "xxx-xx-1121", "XxX-xX-0000", "***-**-1121",
      "XXX-XX-112", "XXXX-XX-1121", "XX*-XX-1121", "XXX_XX_1121",
      "***-**-112a", "XXX-XX-11211",
      // international dial-out phones + near-misses
      "011 7 26 1018 1042", "011-44-20-7946-0958", "011.86.10.6552",
      "011 1 234", "011 123 45678", "012 7 26 1018", "011 1234 26 1018",
      "011 7 26 1018 1042 9999 1", "011+7+26+1018",
      // data-size quantities + near-misses
      "35.4 GB", "500 KB", "1 TB", "2.5TiB", "7 PB", "128 MiB",
      "35.4 gb", "35.4GB", "35.4 GBs", "35.4 XB", ". GB", "35. GB",
      // spaced-dotted state abbrevs + near-misses
      "S. D.", "N. Y.", "n. y.", "W. Va.", "D. C.", "R. I.",
      "S. D", "S.D.", "S . D.", "X. Y.", "S.  D.", "S, D.",
      // uuid:-prefixed ids + near-misses
      "uuid:0f81d810-9dcd-11d1-b245-5ffdce74fad2",
      "UUID:0F81D810-9DCD-11D1-B245-5FFDCE74FAD2",
      "uuid:00000000-0000-0000-0000-000000000000",
      "uuid:0f81d810-9dcd-11d1-b245-5ffdce74fad",
      "uuid:0f81d810-9dcd-11d1-b245-5ffdce74fad2x", "uuid:",
      "xuuid:0f81d810-9dcd-11d1-b245-5ffdce74fad2")
      .foreach(check)
    Seq("\n", "\r\n", " ").foreach { t =>
      check("2021-052" + t); check("00:00:00Z" + t)
      check("6 285 365" + t); check("s3://corpus-0/p.parquet" + t)
      check("1'100.10" + t); check("XXX-XX-1121" + t)
      check("011 7 26 1018 1042" + t); check("35.4 GB" + t)
      check("S. D." + t)
      check("uuid:00000000-0000-0000-0000-000000000000" + t)
    }
  }

  private val tierSevenGen: Gen[String] = Gen.oneOf(
    // ordinal-date shaped
    for (y <- Gen.oneOf("2021", "21", "20215"); sep <- Gen.oneOf("-", "", "_");
         d <- Gen.choose(0, 999); w <- Gen.oneOf(2, 3, 4))
      yield s"$y$sep" + ("%0" + w + "d").format(d),
    // zulu-time shaped
    for (h <- Gen.choose(0, 129); m <- nDigits(2);
         sec <- Gen.oneOf("", ":00", ":5", ":59.1");
         z <- Gen.oneOf("Z", "z", " Z", ""))
      yield s"$h:$m$sec$z",
    // SI-integer shaped
    for (sg <- Gen.oneOf("", "+", "-"); a <- Gen.choose(1, 12345);
         g1 <- Gen.oneOf("285", "28", "2856"); g2 <- Gen.oneOf(" 365", " 36", "", " 3650"))
      yield s"$sg$a $g1$g2",
    // scheme-URL shaped
    for (sch <- Gen.oneOf("s3", "gs", "hdfs", "s3a", "3s", "s_3", "");
         ss <- Gen.oneOf("://", ":/", "//", ":");
         h <- Gen.oneOf("bkt", "corpus-1", "nn:8020", "");
         p <- Gen.oneOf("", "/k", "/shard=5/p.parquet", "/a b"))
      yield s"$sch$ss$h$p",
    // Swiss-float shaped
    for (a <- Gen.choose(1, 12345); g <- Gen.oneOf("100", "10", "1000");
         dec <- Gen.oneOf(".10", ".5", "", ".", ",10"))
      yield s"$a'$g$dec",
    // masked-SSN shaped
    for (m1 <- Gen.oneOf("XXX", "xxx", "***", "XX*", "XXXX");
         m2 <- Gen.oneOf("XX", "xx", "**", "X*", "X");
         s1 <- Gen.oneOf("-", "_", " "); n <- digits)
      yield s"$m1$s1$m2$s1$n",
    // dial-out shaped
    for (p <- Gen.oneOf("011", "012", "01"); s1 <- Gen.oneOf(" ", "-", ".", "+");
         cc <- Gen.choose(1, 9999); g1 <- Gen.oneOf("26", "260", "2", "26000");
         tail <- Gen.oneOf(" 1018 1042", " 1018", "", " 1018 1042 9 9"))
      yield s"$p$s1$cc$s1$g1$tail",
    // data-size shaped
    for (a <- Gen.choose(0, 999); dec <- Gen.oneOf("", ".4", ".");
         sp <- Gen.oneOf(" ", "", "  ");
         u <- Gen.oneOf("GB", "kb", "TiB", "MiB", "XB", "GBs", "B", "PB"))
      yield s"$a$dec$sp$u",
    // spaced-state shaped
    for (a <- Gen.oneOf("S", "N", "W", "X", "s");
         mid <- Gen.oneOf(". ", ".", " . ", ",  ");
         b <- Gen.oneOf("D", "Y", "Va", "y", "Q"); d <- Gen.oneOf(".", ""))
      yield s"$a$mid$b$d",
    // uuid:-prefixed shaped
    for (p <- Gen.oneOf("uuid:", "UUID:", "uid:", "uuid");
         h <- Gen.oneOf("0f81d810-9dcd-11d1-b245-5ffdce74fad2",
           "00000000-0000-0000-0000-000000000000",
           "0f81d810-9dcd-11d1-b245-5ffdce74fad"))
      yield s"$p$h")

  test("r19 tier-seven generated neighborhoods") {
    run(tierSevenGen, 4000, seed = 31)
    run(tierSevenGen.flatMap(b => Gen.oneOf("\n", "\r\n", " ", "x", "")
      .map(b + _)), 2000, seed = 32)
  }
}
