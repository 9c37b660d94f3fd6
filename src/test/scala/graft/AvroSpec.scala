package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AvroSource, GraftData, Sniffer}

/** AvroSource must decode the container format distributed (avro-mapred
  * splits), map nullable unions to Spark nulls, and win the
  * content-vs-extension fight through the sniffer. */
class AvroSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema =
    """{"type":"record","name":"T","fields":[
      |{"name":"id","type":"long"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"score","type":"double"}]}""".stripMargin

  test("avro round-trip with nullable union, mislabeled extension") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-avro").resolve("data.csv").toString
    AvroSource.write(path, schema, (0 until 100).iterator.map(i =>
      Map[String, Any]("id" -> i.toLong,
        "name" -> (if (i % 3 == 0) null else s"n$i"),
        "score" -> i * 0.5)))
    // content beats the .csv name
    assert(Sniffer.sniff(spark, path).format == "avro")
    val loaded = GraftData.load(spark, path)
    assert(loaded.format == "avro")
    val df = loaded.df
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(df.count() == 100)
    assert(df.filter(df("name").isNull).count() == 34)
    val r = df.filter(df("id") === 7).collect()(0)
    assert(r.getString(1) == "n7" && r.getDouble(2) == 3.5)
  }
}
