package graft.tools

/** Golden-value generator (test scope, not shipped): prints the
  * colname_labels oracle VALUES rows from the pure-Scala column-name
  * model, so the SQL pin is authored from the pinned behavior rather
  * than by hand. Run: Test/runMain graft.tools.ColnamePin */
object ColnamePin {
  def main(args: Array[String]): Unit = {
    val names = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment", "event_id", "ts", "user_id", "event_type", "value",
      "props", "doc_id", "text", "lang", "source", "n_chars")
    names.foreach { nm =>
      graft.labelers.ColumnNameLabeler.matchName(nm) match {
        case Some((l, sc)) =>
          val r = BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          println(s"  ('$nm', '$l', $r),")
        case None => println(s"  ('$nm', 'NONE', 0.0),")
      }
    }
  }
}
