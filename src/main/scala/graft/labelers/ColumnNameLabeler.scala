package graft.labelers

/** Column-NAME entity model (reference column_name_model.py:27-316): a
  * fuzzy string match of the column name itself against per-label
  * positive terms, with false-positive overrides — the cheap prior that
  * fires before any data is read. Driver-side only (schema work), no
  * cluster cost.
  *
  * Scoring: exact/containment hits score by coverage; otherwise a
  * normalized Levenshtein similarity. A match below [[Threshold]]
  * returns None (the reference's confidence cutoff).
  */
object ColumnNameLabeler {

  val Threshold = 0.75

  /** label → name terms that indicate it. */
  val Terms: Seq[(String, Seq[String])] = Seq(
    "EMAIL_ADDRESS" -> Seq("email", "e_mail", "email_address", "mail"),
    "PHONE_NUMBER" -> Seq("phone", "phone_number", "telephone", "mobile",
      "cell", "fax"),
    "SSN" -> Seq("ssn", "social_security", "social_security_number"),
    "ADDRESS" -> Seq("address", "street", "city", "zip", "zipcode",
      "postal_code"),
    "PERSON" -> Seq("name", "first_name", "last_name", "full_name",
      "surname"),
    "CREDIT_CARD" -> Seq("credit_card", "card_number", "cc_number", "pan"),
    "DATE" -> Seq("date", "dob", "birth_date", "created_date", "dt"),
    "DATETIME" -> Seq("datetime", "timestamp", "created_at", "updated_at",
      "ts", "event_time"),
    "IPV4" -> Seq("ip", "ip_address", "ipv4"),
    "URL" -> Seq("url", "uri", "link", "website"),
    "UUID" -> Seq("uuid", "guid"),
    "US_STATE" -> Seq("state", "us_state", "province"),
    "DRIVERS_LICENSE" -> Seq("drivers_license", "license_number", "dl_number"),
    "BAN" -> Seq("account_number", "bank_account", "iban", "acct"),
    "INTEGER" -> Seq("id", "count", "qty", "quantity", "number", "num"),
    "FLOAT" -> Seq("price", "amount", "balance", "rate", "ratio", "score"))

  /** False positives: names that contain a term but mean something else
    * (the reference ships per-label negative dicts). */
  val FalsePositives: Set[String] = Set("username", "hostname", "filename",
    "statement", "statistic", "mailing_list")

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  private def similarity(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 1.0 else 1.0 - levenshtein(a, b).toDouble / m
  }

  private def normalize(name: String): String =
    name.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** Best (label, score) for a column name, None under threshold. */
  def matchName(colName: String): Option[(String, Double)] = {
    val n = normalize(colName)
    if (n.isEmpty || FalsePositives.contains(n)) return None
    val scored = Terms.flatMap { case (label, terms) =>
      terms.map { t =>
        val coverage =
          math.min(n.length, t.length).toDouble / math.max(n.length, t.length)
        val score =
          if (n == t) 1.0
          else if ((n.contains(t) || t.contains(n)) &&
              math.min(n.length, t.length) >= 4)
            // substring hit of a meaningful term ≈ rapidfuzz partial
            // ratio: strong regardless of the container's length
            math.max(coverage, 0.85)
          else if (n.contains(t) || t.contains(n)) coverage
          else similarity(n, t)
        (label, score)
      }
    }
    val (label, score) = scored.maxBy(_._2)
    if (score >= Threshold) Some((label, score)) else None
  }
}
