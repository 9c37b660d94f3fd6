package graft.tools

/** EIGHTH per-label fixture family — the r19 rotation of the
  * authored-before-measurement methodology (ladder so far: held-out
  * 0.749, fresh 0.619, tier five 0.681, tier six 0.573, tier seven
  * 0.593 at first blind measurement; each closed to ≥0.956 once its
  * residual census drove the next round's chain/FastMatch/SQL rules).
  * This file was written BLIND — before any cell in it was ever shown
  * to the labeler — and its first measurement is committed as-is with
  * no same-round fixes. The one-shot number is the standing honest
  * generalization estimate of the ensemble (the ladder that replaces
  * the reference's pretrained char-CNN,
  * labelers/character_level_cnn_model.py:204-905).
  *
  * Family choices are real-world conventions disjoint from tiers 1-7:
  * rural-route addresses, Acct#-prefixed accounts, 13-digit Visa PANs,
  * dotted big-endian dates, fractional-second times, ISO 8601 basic
  * (separator-free) datetimes, Lic.-No.-prefixed licenses, IP-literal
  * email domains, parenthesized UUIDs, sha384 widths, CIDR-suffixed
  * IPv4, zone-indexed link-local IPv6, MAC:-prefixed addresses,
  * suffixed person names (Jr./Sr./III), extension-suffixed phones,
  * SS#-prefixed SSNs, userinfo-bearing URLs, 'State of X' names,
  * underscore-grouped integer literals, French full-convention floats
  * (space thousands + comma decimal), duration quantities, French
  * ordinals (1er/2e) — plus a junk tier of ZIP+4 codes, semver tags,
  * license plates, short git SHAs, hex colors and IATA route pairs
  * that a precise labeler must leave UNKNOWN.
  *
  * Usage: runMain graft.tools.LabelerTierEightProbe
  */
object LabelerTierEightProbe {

  import LabelerBench.{firsts, lasts, hex}

  def tierEightCell(label: String, i: Int): String = label match {
    case "ADDRESS" => // USPS rural route
      s"RR ${1 + i % 9} Box ${100 + (i * 7) % 900}"
    case "BAN" => // ledger-export account-number prefix
      s"Acct# ${4000000000L + i * 7919L}"
    case "CREDIT_CARD" => // 13-digit Visa (the classic short PAN)
      f"4${100000 + (i * 37) % 900000}%06d${100000 + (i * 53) % 900000}%06d"
    case "DATE" => // dotted big-endian yyyy.mm.dd (HU/JP convention)
      f"202${i % 4}.${1 + i % 12}%02d.${1 + i % 28}%02d"
    case "TIME" => // fractional-second log time
      f"${i % 24}%02d:${i % 60}%02d:${(i * 7) % 60}%02d.${(i * 31) % 1000}%03d"
    case "DATETIME" => // ISO 8601 basic (separator-free) zulu
      f"202${i % 4}${1 + i % 12}%02d${1 + i % 28}%02dT" +
        f"${i % 24}%02d${i % 60}%02d${(i * 3) % 60}%02dZ"
    case "DRIVERS_LICENSE" => // 'Lic. No.'-prefixed
      s"Lic. No. ${('A' + i % 26).toChar}${1000000 + (i * 17) % 9000000}"
    case "EMAIL_ADDRESS" => // RFC 5321 IP-literal domain
      s"${firsts(i % firsts.size).toLowerCase}$i@" +
        s"[${10 + i % 200}.${(i * 3) % 256}.${(i * 7) % 256}.${1 + i % 254}]"
    case "UUID" => // parenthesized (log-context) form
      s"(${hex(i * 0x9E3779B9, 8)}-${hex(i * 40503, 4)}-" +
        s"${hex(i * 929, 4)}-${hex(i * 83, 4)}-${hex(i, 6)}${hex(i * 17, 6)})"
    case "HASH_OR_KEY" => // sha384 width (96 hex)
      (1 to 12).map(k => hex((i + 7) * (2 * k + 1) * 48271, 8)).mkString
    case "IPV4" => // CIDR-suffixed network form
      s"${10 + i % 200}.${(i * 3) % 256}.${(i * 7) % 256}.0/${8 + i % 25}"
    case "IPV6" => // zone-indexed link-local (RFC 4007)
      s"fe80::${hex(i * 7 + 1, 4)}:${hex(i * 13 + 1, 4)}%eth${i % 4}"
    case "MAC_ADDRESS" => // 'MAC:'-prefixed inventory form
      s"MAC: ${(0 until 6).map(k => hex(i * (k + 5) * 11, 2).toUpperCase).mkString("-")}"
    case "PERSON" => // generational-suffix form
      s"${firsts(i % firsts.size)} ${lasts(i % lasts.size)} " +
        Seq("Jr.", "Sr.", "III", "IV")(i % 4)
    case "PHONE_NUMBER" => // extension-suffixed office line
      f"${200 + i % 800}-${200 + (i * 3) % 800}-${1000 + (i * 7) % 9000} ext. ${1 + i % 99}"
    case "SSN" => // 'SS#'-prefixed payroll form
      f"SS# ${100 + i % 900}-${10 + i % 90}-${1000 + (i * 11) % 9000}"
    case "URL" => // userinfo-bearing FTP locator
      s"ftp://u$i:pw${i % 100}@files${i % 10}.ex${i % 10}.org/pub/f$i.dat"
    case "US_STATE" => // 'State of X' legal style
      "State of " + Seq("California", "Texas", "Ohio", "Maine", "Iowa",
        "Nevada", "Oregon", "Kansas")(i % 8)
    case "INTEGER" => // programmer underscore grouping
      f"${1 + i % 9}_${100 + (i * 37) % 900}%03d_${100 + (i * 53) % 900}%03d"
    case "FLOAT" => // French full convention: space thousands, comma decimal
      f"${1 + i % 9} ${100 + (i * 31) % 900}%03d,${10 + i % 90}%02d"
    case "QUANTITY" => // durations
      s"${1 + i % 500}${if (i % 3 == 0) "" else "." + (i % 10)} " +
        Seq("min", "sec", "ms", "hr")(i % 4)
    case "ORDINAL" => // French ordinals (1er, 2e, …)
      { val n = 1 + i % 100; s"$n${if (n == 1) "er" else "e"}" }
    case "UNKNOWN" => (i % 6) match {
      case 0 => f"${10000 + (i * 89) % 90000}%05d-${1000 + (i * 7) % 9000}%04d" // ZIP+4
      case 1 => s"v${i % 10}.${i % 20}.${i % 15}-rc.${1 + i % 5}" // semver tag
      case 2 => s"${('A' + i % 26).toChar}${('A' + (i * 3) % 26).toChar}" +
        s"${('A' + (i * 7) % 26).toChar}-${1000 + (i * 13) % 9000}" // plate
      case 3 => hex(i * 31 + 7, 7) // short git SHA
      case 4 => s"#${hex(i * 101, 6).toUpperCase}" // hex color
      case _ => s"${Seq("JFK", "LAX", "ORD", "SFO", "ATL")(i % 5)}-" +
        s"${Seq("LHR", "CDG", "NRT", "DXB", "SYD")((i * 3) % 5)}" // IATA pair
    }
    case other => sys.error(s"no tier-eight generator for $other")
  }

  /** AUTHORED BLIND in r19; to be measured ONCE, after all r19 labeler
    * code freezes. The printed number + residual census are committed
    * as-is (SCALING.md); fixes belong to the NEXT round. */
  def main(args: Array[String]): Unit =
    LabelerTierHarness.run("tier8", "measured ONCE, no fixes",
      tierEightCell)
}
