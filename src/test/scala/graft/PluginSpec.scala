package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.labelers.DataLabeler
import graft.plugins.Registry

class PluginSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("defaults resolve and assemble a working pipeline") {
    import spark.implicits._
    assert(Registry.names("label_model").contains("regex"))
    assert(Registry.names("media_decoder").contains("stub"))
    val pipe = Registry.labelerPipeline()
    val df = Seq("a@b.com", "c@d.org", "plain").toDF("v")
    assert(pipe.labelColumn(df, "v") == "EMAIL_ADDRESS")
  }

  test("registered plugin shadows a default and plugs into the pipeline") {
    object ShoutModel extends DataLabeler.LabelModel {
      def label(c: Column): Column =
        when(c.isNull, lit(null).cast("string"))
          .when(c === upper(c) && c =!= "", lit("SHOUT"))
          .otherwise(lit("UNKNOWN"))
    }
    Registry.register("label_model", "shout", ShoutModel)
    assert(Registry.names("label_model").contains("shout"))
    import spark.implicits._
    val pipe = Registry.labelerPipeline(model = "shout")
    val df = Seq("HELLO", "WORLD", "quiet").toDF("v")
    assert(pipe.labelColumn(df, "v") == "SHOUT")
  }
}
