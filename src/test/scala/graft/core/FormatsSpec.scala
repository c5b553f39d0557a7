package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format surface beyond parquet (S1 JSON in, S8 TSV out are
  * the reference's only formats): ORC, JSON-lines, and CSV roundtrips
  * with their documented fidelity limits — ORC is schema-full (lossless
  * like parquet), JSON loses type width (longs stay longs, but
  * float/double distinctions need a read schema), CSV is stringly (read
  * schema or inferSchema required). spark-avro is not bundled in this
  * container; ORC covers the columnar-alternative slot. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5, true),
    (2L, "beta,with,commas", -2.25, false),
    (3L, null.asInstanceOf[String], 0.0, true)
  ).toDF("id", "name", "score", "flag")

  test("ORC roundtrip is lossless (schema + values + nulls)") {
    val dir = scratch("fmt-orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // names + types roundtrip exactly; nullability relaxes to true on
    // read (file sources can't prove non-null — parquet behaves the same)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      sample.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("JSON-lines roundtrip with explicit read schema preserves values") {
    val dir = scratch("fmt-json")
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    // null column value: JSON omits the field, read restores null
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("CSV roundtrip: quoting survives embedded delimiters; schema on read") {
    val dir = scratch("fmt-csv")
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(dir)
    val row2 = back.where(col("id") === 2L).head()
    assert(row2.getString(1) == "beta,with,commas") // quoted, not split
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("TSV export (S8 fidelity): tab separator, no header, readable back") {
    val dir = scratch("fmt-tsv")
    sample.select(col("id"), col("name")).write.mode("overwrite")
      .option("sep", "\t").option("header", "false").csv(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val back = spark.read.option("sep", "\t").schema(schema).csv(dir)
    assert(back.count() == 3)
    assert(back.where(col("id") === 1L).head().getString(1) == "alpha")
  }
}
