package graft.tools

/** SIXTH per-label fixture family — the r17 rotation of the
  * authored-before-measurement methodology (tier ladder so far:
  * held-out 0.749, fresh 0.619, tier five 0.681 at first blind
  * measurement; each closed to 0.97+ once its residual census drove
  * the next round's chain/FastMatch/SQL rules). This file was written
  * BLIND — before any cell in it was ever shown to the labeler — and
  * its first measurement is committed as-is with no same-round fixes.
  * The one-shot number is the standing honest generalization estimate
  * of the ensemble (the ladder that replaces the reference's
  * pretrained char-CNN, labelers/character_level_cnn_model.py:204-905).
  *
  * Family choices are real-world conventions disjoint from tiers 1-5:
  * unix `date` output, ISO week dates, masked/prefixed ids, userinfo
  * URLs, zone-indexed IPv6, underscore digit grouping, honorific
  * names, currency-code amounts — plus a junk tier of VINs, ISSNs,
  * git-describe tags and base64 blobs that a precise labeler must
  * leave UNKNOWN.
  *
  * Usage: runMain graft.tools.LabelerTierSixProbe
  */
object LabelerTierSixProbe {

  import LabelerBench.{firsts, lasts, hex}

  private val Wkd = Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val Mon = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
    "Aug", "Sep", "Oct", "Nov", "Dec")
  private val Honorifics = Seq("Dr.", "Mr.", "Ms.", "Prof.")
  private val RomanTens = Seq("X", "XX", "XXX", "XL")

  def tierSixCell(label: String, i: Int): String = label match {
    case "ADDRESS" => // unit-first comma form (AU/UK convention)
      s"Unit ${1 + i % 40}, ${5 + i % 120} Harbour Way"
    case "BAN" => // ledger 'A/C'-prefixed account number
      s"A/C ${10000000000L + i * 137}"
    case "CREDIT_CARD" => // Diners Club 14-digit (36 prefix)
      s"36${100000000000L + (i.toLong * 7919) % 900000000000L}".take(14)
    case "DATE" => // ISO 8601 week date
      f"202${i % 4}-W${1 + i % 52}%02d-${1 + i % 7}"
    case "TIME" => // 12h with seconds + named zone abbrev
      f"${1 + i % 12}:${i % 60}%02d:${(i * 7) % 60}%02d PM EST"
    case "DATETIME" => // unix date(1) / asctime with zone
      f"${Wkd(i % 7)} ${Mon(i % 12)} ${1 + i % 28}%2d " +
        f"${i % 24}%02d:${i % 60}%02d:${(i * 3) % 60}%02d UTC 202${i % 4}"
    case "DRIVERS_LICENSE" => // 'DL#'-prefixed, state-coded
      s"DL# TX ${10000000 + i}"
    case "EMAIL_ADDRESS" => // (at)/(dot) obfuscation
      s"${firsts(i % firsts.size).toLowerCase}$i(at)ex${i % 10}(dot)org"
    case "UUID" => // Windows registry GUID= prefix, uppercase braces
      // NOTE: the blind one-shot (0.573) was measured with .toUpperCase
      // binding only to the second concat operand (mixed-case hex) —
      // label outcome is identical (the UUID forms are hex-case-blind),
      // so the standing number carries; fixed for readability (r17
      // self-review)
      (s"GUID={${hex(i * 0x9E3779B9, 8)}-${hex(i * 40503, 4)}-" +
        s"${hex(i * 929, 4)}-${hex(i * 83, 4)}-${hex(i, 6)}${hex(i * 17, 6)}}")
        .toUpperCase
    case "HASH_OR_KEY" => // 0x-prefixed 64-hex digest (solidity/eth logs)
      val b = (1 to 8).map(k => hex((i + 7) * (2 * k + 5) * 48271, 8)).mkString
      s"0x${b.take(64)}"
    case "IPV4" => // zero-padded octets (fixed-width exports)
      f"${10 + i % 200}%03d.${(i * 3) % 256}%03d.${(i * 7) % 256}%03d.${1 + i % 254}%03d"
    case "IPV6" => // link-local with zone index
      s"fe80::${hex(1 + i, 4)}:${hex(i * 3 + 1, 4)}%eth${i % 4}"
    case "MAC_ADDRESS" => // Cisco dotted-triple with 'MAC' prefix word
      s"MAC ${hex(i * 7, 4)}.${hex(i * 11, 4)}.${hex(i * 13, 4)}"
    case "PERSON" => // honorific + generational suffix
      s"${Honorifics(i % 4)} ${firsts(i % firsts.size)} " +
        s"${lasts(i % lasts.size)}${if (i % 3 == 0) " Jr." else ""}"
    case "PHONE_NUMBER" => // NANP with worded extension
      f"(${200 + i % 700}) ${200 + (i * 3) % 700}-${1000 + (i * 7) % 9000} ext. ${1 + i % 99}"
    case "SSN" => // '#'-glued compact form
      f"SSN#${100 + i % 900}${10 + i % 90}${1000 + (i * 11) % 9000}"
    case "URL" => // userinfo + explicit port (connection strings)
      s"https://u$i:pw$i@db${i % 10}.example.com:${5000 + i % 4000}/env"
    case "US_STATE" => // uppercase traditional abbrev, no dot
      Seq("MASS", "CALIF", "TENN", "WYO", "CONN", "MICH")(i % 6)
    case "INTEGER" => // underscore digit grouping (code/config literals)
      s"${1 + i % 9}_${100 + (i * 37) % 900}_${100 + (i * 53) % 900}"
    case "FLOAT" => // accounting-negative decimal (parenthesized)
      s"(${1 + i % 9},${100 + (i * 31) % 900}.${10 + i % 90})"
    case "QUANTITY" => // ISO 4217 currency-code amount
      s"${1 + i % 999}.${10 + i % 90} ${Seq("USD", "EUR", "GBP", "JPY")(i % 4)}"
    case "ORDINAL" => // roman-numeral ordinal (regnal/outline style)
      if (i % 2 == 0)
        Seq("Ist", "IInd", "IIIrd", "IVth", "Vth", "VIth", "VIIth",
          "VIIIth", "IXth")(i % 9)
      else s"${RomanTens(i % 4)}${Seq("th", "IIIrd", "Vth", "IXth")((i / 2) % 4)}"
    case "UNKNOWN" => (i % 6) match {
      case 0 => s"1HGCM8263${3 + i % 7}A${100000 + i}" // VIN
      case 1 => f"2049-36${i % 100}%02d" // ISSN
      case 2 => s"v2.${i % 20}.${i % 9}-${1 + i % 40}-g${hex(i * 31, 7)}" // git describe
      case 3 => (0 until 3).map(k => hex(i * 7 + k, 8)).mkString + "==" // base64ish blob
      case 4 => s"ORD-2023-${100000 + i}" // order id
      case _ => s"${1 + i % 9}'${2 + i % 10}\"" // feet-inches
    }
    case other => sys.error(s"no tier-six generator for $other")
  }

  /** AUTHORED BLIND in r17, one-shot 0.573 (junk 0.521) committed
    * as-is; its census drove the r18 chain/guard fixes and the tier is
    * now a TUNED regression pin (1.000, zero residuals — r18). */
  def main(args: Array[String]): Unit =
    LabelerTierHarness.run("tier6",
      "TUNED tier since r18 - regression pin", tierSixCell)
}
