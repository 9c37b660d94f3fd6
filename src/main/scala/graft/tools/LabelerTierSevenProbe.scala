package graft.tools

/** SEVENTH per-label fixture family — the r18 rotation of the
  * authored-before-measurement methodology (ladder so far: held-out
  * 0.749, fresh 0.619, tier five 0.681, tier six 0.573 at first blind
  * measurement; each closed to ≥0.978 once its residual census drove
  * the next round's chain/FastMatch/SQL rules). This file was written
  * BLIND — before any cell in it was ever shown to the labeler — and
  * its first measurement is committed as-is with no same-round fixes.
  * The one-shot number is the standing honest generalization estimate
  * of the ensemble (the ladder that replaces the reference's
  * pretrained char-CNN, labelers/character_level_cnn_model.py:204-905).
  *
  * Family choices are real-world conventions disjoint from tiers 1-6:
  * ISO offset datetimes, ordinal dates, zulu times, UnionPay 19-digit
  * PANs, IBAN:-prefixed accounts, quoted display-name addresses,
  * uuid:-prefixed ids, sha224 widths, port-suffixed IPv4, uppercase
  * IPv4-mapped IPv6, EUI-64 MACs, double-initial names, international
  * dial-out phones, masked SSNs, s3:// URLs, spaced-dotted state
  * abbrevs, SI space-grouped integers, Swiss apostrophe floats, data
  * sizes, uppercase ordinal suffixes, PO boxes, citation license
  * numbers — plus a junk tier of ULIDs, cron expressions, k8s pod
  * names, ISBN-10s, flight codes and JWT-ish dotted base64 that a
  * precise labeler must leave UNKNOWN.
  *
  * Usage: runMain graft.tools.LabelerTierSevenProbe
  */
object LabelerTierSevenProbe {

  import LabelerBench.{firsts, lasts, hex}

  private val B32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ" // Crockford
  private def b32(n: Int, len: Int): String =
    (0 until len).map(k => B32(math.abs(n * 31 + k * 7) % 32)).mkString

  def tierSevenCell(label: String, i: Int): String = label match {
    case "ADDRESS" => // PO box (USPS convention)
      s"PO Box ${100 + i % 9000}"
    case "BAN" => // 'IBAN:'-prefixed electronic form
      f"IBAN: DE${10 + i % 90}3704004405320130${i % 100}%02d"
    case "CREDIT_CARD" => // UnionPay 19-digit, 4-4-4-4-3 spaced
      f"62${21 + i % 79}%02d ${1000 + (i * 7) % 9000} " +
        f"${1000 + (i * 13) % 9000} ${1000 + (i * 17) % 9000} ${100 + i % 900}"
    case "DATE" => // ISO 8601 ordinal date yyyy-ddd
      f"202${i % 4}-${1 + (i * 3) % 365}%03d"
    case "TIME" => // zulu-suffixed 24h time
      f"${i % 24}%02d:${i % 60}%02d:${(i * 7) % 60}%02dZ"
    case "DATETIME" => // ISO 8601 with numeric utc offset
      f"202${i % 4}-${1 + i % 12}%02d-${1 + i % 28}%02dT" +
        f"${i % 24}%02d:${i % 60}%02d:${(i * 3) % 60}%02d" +
        f"${if (i % 2 == 0) "+" else "-"}${1 + i % 12}%02d:${if (i % 3 == 0) 30 else 0}%02d"
    case "DRIVERS_LICENSE" => // citation 'OLN:' prefix
      s"OLN: ${('A' + i % 26).toChar}${10000000 + i}"
    case "EMAIL_ADDRESS" => // RFC 5322 quoted display-name
      s""""${lasts(i % lasts.size)}, ${firsts(i % firsts.size)}" """ +
        s"<${firsts(i % firsts.size).toLowerCase}$i@ex${i % 10}.org>"
    case "UUID" => // bare 'uuid:'-prefixed lowercase
      s"uuid:${hex(i * 0x9E3779B9, 8)}-${hex(i * 40503, 4)}-" +
        s"${hex(i * 929, 4)}-${hex(i * 83, 4)}-${hex(i, 6)}${hex(i * 17, 6)}"
    case "HASH_OR_KEY" => // sha224 width (56 hex)
      (1 to 7).map(k => hex((i + 3) * (2 * k + 1) * 16807, 8)).mkString
    case "IPV4" => // socket-address port suffix
      s"${10 + i % 200}.${(i * 3) % 256}.${(i * 7) % 256}.${1 + i % 254}:${1024 + i % 60000}"
    case "IPV6" => // uppercase IPv4-mapped form
      s"::FFFF:${10 + i % 200}.${(i * 3) % 256}.${(i * 7) % 256}.${1 + i % 254}"
    case "MAC_ADDRESS" => // EUI-64 (8 colon groups)
      (0 until 8).map(k => hex(i * (k + 3) * 7, 2)).mkString(":")
    case "PERSON" => // double-initial form
      s"${('A' + i % 26).toChar}. ${('A' + (i * 3) % 26).toChar}. " +
        s"${lasts(i % lasts.size)}"
    case "PHONE_NUMBER" => // international dial-out (011 prefix)
      f"011 ${1 + i % 99} ${20 + i % 80} ${1000 + (i * 3) % 9000} ${1000 + (i * 7) % 9000}"
    case "SSN" => // masked form (only last four visible)
      f"XXX-XX-${1000 + (i * 11) % 9000}"
    case "URL" => // s3:// object-store scheme
      s"s3://corpus-${i % 20}/shard=${i % 100}/part-${1000 + i}.parquet"
    case "US_STATE" => // spaced-dotted traditional abbrev
      Seq("N. Y.", "N. J.", "N. H.", "N. M.", "N. C.", "S. D.")(i % 6)
    case "INTEGER" => // SI / French space grouping
      f"${1 + i % 9} ${100 + (i * 37) % 900}%03d ${100 + (i * 53) % 900}%03d"
    case "FLOAT" => // Swiss apostrophe thousands grouping
      f"${1 + i % 9}'${100 + (i * 31) % 900}%03d.${10 + i % 90}%02d"
    case "QUANTITY" => // data sizes
      s"${1 + i % 500}${if (i % 3 == 0) "" else "."}${if (i % 3 == 0) "" else (i % 10).toString} " +
        Seq("KB", "MB", "GB", "TB")(i % 4)
    case "ORDINAL" => // uppercase suffix (headers/legal caps)
      s"${1 + i % 100}${Seq("ST", "ND", "RD", "TH")(i % 4)}"
    case "UNKNOWN" => (i % 6) match {
      case 0 => b32(i + 11, 26) // ULID
      case 1 => s"*/${1 + i % 30} * * * ${i % 7}" // cron expression
      case 2 => s"web-${hex(i * 23, 7)}-${b32(i, 5).toLowerCase}" // k8s pod
      case 3 => s"0-306-${40600 + i % 100}-${i % 10}" // ISBN-10
      case 4 => s"${('A' + i % 26).toChar}${('A' + (i * 5) % 26).toChar}${100 + i % 9000}" // flight code
      case _ => s"ey${b32(i * 3, 10)}.ey${b32(i * 7, 12)}.${b32(i * 11, 8)}" // JWT-ish
    }
    case other => sys.error(s"no tier-seven generator for $other")
  }

  /** AUTHORED BLIND in r18; to be measured ONCE, after all r18 labeler
    * code freezes. The printed number + residual census are committed
    * as-is (SCALING.md); fixes belong to the NEXT round. */
  def main(args: Array[String]): Unit =
    LabelerTierHarness.run("tier7", "measured ONCE, no fixes",
      tierSevenCell)
}
