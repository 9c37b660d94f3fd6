package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed Avro reader built on the avro-mapred input format (the
  * container ships avro core/mapred but NOT the spark-avro datasource
  * module, so `spark.read.format("avro")` is unavailable). The embedded
  * writer schema is read driver-side from the file header (like the
  * sniffer's head probe), mapped to a Spark `StructType`, and the
  * records decode to Rows inside the scan stage — splits parallelize
  * across Avro blocks exactly as any Hadoop input format does, so the
  * plan scales with the file like a native source (no pushdown, which
  * matches the reference's fastavro full-read, avro_data.py:63-160).
  */
object AvroSource {

  /** Avro type → Spark type for the primitive + nullable-union subset
    * the reference's fixtures use (avro_data.py:106-160 flattens the
    * same shapes). */
  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.UNION =>
      // nullable unions: [null, T] → T (nullable handled by Row nulls)
      val nonNull = s.getTypes.toArray.map(_.asInstanceOf[Schema])
        .filter(_.getType != Schema.Type.NULL)
      if (nonNull.length == 1) sparkType(nonNull(0)) else StringType
    case _ => StringType // nested records/arrays render as JSON-ish text
  }

  /** Driver-side schema probe: the Avro container header embeds the
    * writer schema before any data block. */
  def readSchema(spark: SparkSession, path: String): Schema = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val reader = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try reader.getSchema finally reader.close()
    } finally scala.util.Try(in.close())
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = readSchema(spark, path)
    val fields = avroSchema.getFields.toArray
      .map(_.asInstanceOf[Schema.Field])
    val names = fields.map(_.name)
    val struct = StructType(fields.map(f =>
      StructField(f.name, sparkType(f.schema), nullable = true)))
    // AvroInputFormat silently drops files not named *.avro by default —
    // content beats extension here (mislabeled fixtures are the norm)
    spark.sparkContext.hadoopConfiguration.setBoolean(
      "avro.mapred.ignore.inputs.without.extension", false)
    val rdd = spark.sparkContext.hadoopFile(
      path,
      classOf[AvroInputFormat[GenericRecord]],
      classOf[AvroWrapper[GenericRecord]],
      classOf[NullWritable])
    // conversion is driven by the TARGET Spark type: a multi-branch
    // union maps to StringType, so its values (whatever Avro branch they
    // came from) must render as text — matching on the runtime class
    // alone would hand e.g. an Integer to a StringType column and crash
    // the scan
    val targets = struct.fields.map(_.dataType)
    val rows = rdd.map { case (w, _) =>
      val r = w.datum()
      Row.fromSeq(names.indices.map { i =>
        (r.get(names(i)), targets(i)) match {
          case (null, _) => null
          case (v, BinaryType) => v match {
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case f: org.apache.avro.generic.GenericFixed => f.bytes()
            case other => other.toString.getBytes("UTF-8")
          }
          case (v, StringType) => v.toString
          case (x: java.lang.Number, _) => x
          case (b: java.lang.Boolean, _) => b
          case (other, _) => other.toString
        }
      })
    }
    spark.createDataFrame(rows, struct)
  }

  /** Driver-side fixture writer (avro core API) — test/bootstrap helper;
    * production writes stay with whatever wrote the data. */
  def write(path: String, schemaJson: String,
      records: Iterator[Map[String, Any]]): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    w.create(schema, f)
    try records.foreach { m =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      m.foreach { case (k, v) => rec.put(k, v) }
      w.append(rec)
    } finally w.close()
  }
}
