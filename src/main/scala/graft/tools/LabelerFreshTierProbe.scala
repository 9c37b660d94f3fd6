package graft.tools

/** Fresh-tier rotation probe — FOURTH per-label family. History: its
  * one-shot standing measurement in r15 was 0.619; r16 closed the
  * census it named (display-name emails, compact-ISO dates, €/£ money,
  * tel: URIs, Pkwy suffixes, dot-separator times, UK nationals,
  * space-separated MACs, legal 'd' ordinals, U+2212 integers,
  * protocol-relative/localhost URLs) with chain/FastMatch/SQL lockstep
  * additions, after which this tier scores 0.999. Like the adversarial
  * and held-out tiers before it, it is now a TUNED tier: its number is
  * a regression pin, not a generalization estimate — that role rotates
  * to [[LabelerTierFiveProbe]], authored before first measurement.
  *
  * Usage: runMain graft.tools.LabelerFreshTierProbe
  */
object LabelerFreshTierProbe {

  import LabelerBench.{firsts, lasts, hex}




  def freshCell(label: String, i: Int): String = label match {
    case "ADDRESS" =>
      if (i % 2 == 0) s"${100 + i} Industrial Pkwy" // suffix NOT in the list
      else s"${10 + i % 90} Harbor Rd Floor ${1 + i % 20}"
    case "BAN" => s"Acc# ${(4000000000L + i * 7919L).toString.take(11)}"
    case "CREDIT_CARD" => // Diners 4-6-4
      s"3056 9309${i % 10}2 590${i % 10}"
    case "DATE" =>
      if (i % 2 == 0) f"202${i % 4}${1 + i % 12}%02d${1 + i % 28}%02d" // basic ISO compact
      else s"${1 + i % 28}th July 202${i % 4}"
    case "TIME" => f"${1 + i % 12}.${i % 60}%02dam" // dot separator, glued meridiem
    case "DATETIME" => // Apache common log format
      f"${1 + i % 28}%02d/Jul/202${i % 4}:${i % 24}%02d:${i % 60}%02d:00 +0000"
    case "DRIVERS_LICENSE" => s"DL: ${('A' + i % 26).toChar}${1000000 + i}"
    case "EMAIL_ADDRESS" => // display-name form
      s"${firsts(i % firsts.size)} ${lasts(i % lasts.size)} <user$i@ex${i % 10}.org>"
    case "UUID" =>
      s"guid: ${hex(i * 0x9E3779B1, 8)}-${hex(i * 40503, 4)}-" +
        s"${hex(i * 531, 4)}-${hex(i * 77, 4)}-${hex(i, 6)}${hex(i * 13, 6)}"
    case "HASH_OR_KEY" =>
      val base = (1 to 8).map(k => hex((i + 7) * (2 * k + 1) * 48271, 8)).mkString
      if (i % 2 == 0) s"md5=${base.take(32)}" else s"0x${base.take(40)}"
    case "IPV4" =>
      s"ip=${i % 256}.${(i * 3) % 256}.${(i * 7) % 256}.${(i * 11) % 256}"
    case "IPV6" => s"fe80::${hex(i + 1, 4)}:${hex(i * 3 + 1, 4)}%eth0" // zone index
    case "MAC_ADDRESS" => // space-separated octets
      f"00 1b 44 ${i % 256}%02x ${(i * 3) % 256}%02x ${(i * 7) % 256}%02x"
    case "PERSON" =>
      s"Prof. ${firsts(i % firsts.size)} ${lasts(i % lasts.size)}, PhD"
    case "PHONE_NUMBER" =>
      if (i % 2 == 0) s"tel:+1415555${1000 + i % 9000}" // RFC 3966
      else s"(0)20 ${7000 + i % 1000} ${1000 + (i * 3) % 9000}" // UK national
    case "SSN" =>
      f"SSN# ${100 + i % 900}%03d-${10 + i % 90}%02d-${1000 + (i * 3) % 9000}%04d"
    case "URL" =>
      if (i % 2 == 0) s"//cdn.example${i % 10}.com/lib/$i.js" // protocol-relative
      else s"localhost:${8000 + i % 1000}/health/$i"
    case "US_STATE" =>
      if (i % 2 == 0) "State of California" else "NY State"
    case "INTEGER" => s"\u2212${i * 37 + 1}" // U+2212 minus sign
    case "FLOAT" => s".${10 + i % 90}e-${1 + i % 9}" // bare-dot + exponent
    case "QUANTITY" =>
      if (i % 2 == 0) s"\u20ac${1 + i % 99}" else s"\u00a3${1 + i % 9}.${10 + i % 90}"
    case "ORDINAL" => s"${2 + (i * 41) % 98}d" // legal style (2d, 3d, 43d)
    case "UNKNOWN" => (i % 6) match {
      case 0 => s"v${1 + i % 9}.${i % 10}.${i % 20}" // semver
      case 1 => s"en-${Seq("US", "GB", "AU")(i % 3)}" // locale tag
      case 2 => s"#${hex(i * 104729, 6).toUpperCase}" // hex color
      case 3 => s"x$i@y" // truncated email-ish
      case 4 => s"C:\\temp\\file$i.txt" // windows path
      case _ => s"${10 + i % 90}-${10 + i % 90}" // two-group id
    }
    case other => sys.error(s"no fresh generator for $other")
  }

  def main(args: Array[String]): Unit =
    LabelerTierHarness.run("fresh",
      "TUNED tier since r16 — regression pin, not a generalization estimate",
      freshCell)
}
