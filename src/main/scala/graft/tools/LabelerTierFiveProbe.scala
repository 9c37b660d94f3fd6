package graft.tools

/** FIFTH per-label fixture family — the r16 rotation of the
  * authored-before-measurement methodology (r15 held-out tier →
  * 0.749 pre-fix; r15 fresh tier → 0.619 pre-fix): this file was
  * written BLIND, before any cell in it was ever shown to the
  * labeler, and its first measurement is committed as-is with no
  * fixes applied in the same round. The one-shot number is the
  * standing honest generalization estimate; the residual census it
  * prints is the NEXT round's work list (the ladder that replaces the
  * reference's pretrained char-CNN,
  * labelers/character_level_cnn_model.py:204-905).
  *
  * Family choices are real-world conventions disjoint from tiers 1-4:
  * several are deliberate hard probes (vanity-free but prefixed or
  * wrapped forms, European numerics, URI-scheme'd values) chosen
  * because real corpora contain them, not because the ensemble is
  * expected to pass.
  *
  * Usage: runMain graft.tools.LabelerTierFiveProbe
  */
object LabelerTierFiveProbe {

  import LabelerBench.{firsts, lasts, hex}

  private val Weekdays =
    Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
      "Saturday", "Sunday")
  private val WordOrdinals = Seq("first", "second", "third", "fourth",
    "twenty-first", "thirty-second", "forty-third", "ninety-ninth")

  def tierFiveCell(label: String, i: Int): String = label match {
    case "ADDRESS" => // square/crescent suffixes, unit-first comma form
      if (i % 2 == 0) s"${12 + i % 80} Maple Sq"
      else s"${40 + i % 50} Oak Cres, Unit ${1 + i % 12}"
    case "BAN" => // spaced IBAN (ISO 13616 paper format)
      s"GB${29 + i % 70} NWBK 6016 1331 92${i % 10}8 ${10 + i % 90}"
    case "CREDIT_CARD" => // Amex paper grouping 4-6-5
      s"37${i % 10}8 8224${i % 10}3 1000${i % 10}"
    case "DATE" => // weekday-prefixed long form
      s"${Weekdays(i % 7)}, March ${1 + i % 28}, 202${i % 4}"
    case "TIME" => // standalone time with fractional seconds
      f"${i % 24}%02d:${i % 60}%02d:${(i * 7) % 60}%02d.${(i * 13) % 1000}%03d"
    case "DATETIME" => // RFC 2822 (email Date: header)
      f"Tue, ${1 + i % 28}%02d Jul 202${i % 4} ${i % 24}%02d:${i % 60}%02d:00 +0200"
    case "DRIVERS_LICENSE" => // 'Lic. No.' prefixed
      s"Lic. No. ${('A' + i % 26).toChar}${10000000 + i}"
    case "EMAIL_ADDRESS" => // mailto: URI
      s"mailto:${firsts(i % firsts.size).toLowerCase}.${lasts(i % lasts.size).toLowerCase}$i@ex${i % 10}.co.uk"
    case "UUID" => // RFC 4122 urn form
      s"urn:uuid:${hex(i * 0x85EBCA6B, 8)}-${hex(i * 40503, 4)}-" +
        s"${hex(i * 531, 4)}-${hex(i * 77, 4)}-${hex(i, 6)}${hex(i * 13, 6)}"
    case "HASH_OR_KEY" => // docker/OCI digest prefix
      val base = (1 to 8).map(k => hex((i + 11) * (2 * k + 3) * 16807, 8)).mkString
      s"sha256:${base.take(64)}"
    case "IPV4" => // CIDR subnet form
      s"${10 + i % 200}.${(i * 3) % 256}.${(i * 7) % 256}.0/${8 + i % 24}"
    case "IPV6" => // bracketed URL-literal with port
      s"[2001:db8::${hex(i + 1, 4)}]:${443 + i % 1000}"
    case "MAC_ADDRESS" => // ifconfig 'HWaddr' prefix, lowercase colons
      f"HWaddr 00:1b:44:${i % 256}%02x:${(i * 3) % 256}%02x:${(i * 7) % 256}%02x"
    case "PERSON" => // HR-export all-caps surname-first
      s"${lasts(i % lasts.size).toUpperCase}, ${firsts(i % firsts.size).toUpperCase}"
    case "PHONE_NUMBER" => // dotted NANP with extension suffix
      f"415.55${i % 10}.${1000 + (i * 3) % 9000} x${200 + i % 700}"
    case "SSN" => // space-separated, word-prefixed
      f"SSN ${100 + i % 900} ${10 + i % 90} ${1000 + (i * 7) % 9000}"
    case "URL" => // query string + fragment
      s"https://ex${i % 10}.example.com/search?q=a+b$i&lang=en#r$i"
    case "US_STATE" => // formal commonwealth/state-of long form
      Seq("Commonwealth of Massachusetts", "Commonwealth of Virginia",
        "State of Texas", "Commonwealth of Kentucky")(i % 4)
    case "INTEGER" => // accounting negative (parenthesized, grouped)
      s"(${1 + i % 9},${100 + (i * 37) % 900})"
    case "FLOAT" => // full European convention: dot groups, comma decimal
      s"${1 + i % 9}.${100 + (i * 31) % 900},${10 + i % 90}"
    case "QUANTITY" => // compound rate unit
      s"${1 + i % 120} km/h"
    case "ORDINAL" => // written-out word ordinals
      WordOrdinals(i % WordOrdinals.size)
    case "UNKNOWN" => (i % 6) match {
      case 0 => s"978-3-16-${100000 + i}-0" // ISBN-13 (not in vocab)
      case 1 => hex(i * 2654435761L.toInt, 7) // short git SHA
      case 2 => s"JIRA-${1000 + i}" // ticket id
      case 3 => "#!/usr/bin/env python3" // shebang
      case 4 => s"C${i % 9 + 1}H${i % 20 + 2}O${i % 6 + 1}" // formula
      case _ => Seq("AB+", "O-", "A+", "B-")(i % 4) // blood type
    }
    case other => sys.error(s"no tier-five generator for $other")
  }

  /** One-shot standing measurement taken 2026-08-16 after all r16
    * labeler code froze: **0.681** (committed in SCALING.md with the
    * full residual census — it became the r17 work list). r17 closed
    * all seven named families (chain/FastMatch/SQL lockstep rules) and
    * both junk-tier NB leaks (nbGuards) → re-measured 1.000; this tier
    * is now a TUNED regression pin. The generalization role rotated to
    * [[LabelerTierSixProbe]] (authored blind in r17). */
  def main(args: Array[String]): Unit =
    LabelerTierHarness.run("tier5", "TUNED tier - regression pin since r17",
      tierFiveCell)
}
