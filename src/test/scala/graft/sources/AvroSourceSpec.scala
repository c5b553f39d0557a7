package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-trip + pruning contract of the native `graftavro` connector. */
class AvroSourceSpec extends SparkSpec {

  test("lineitem round-trip is lossless (longs, doubles, strings)") {
    val dir = scratch("avro-li")
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")
    src.write.format("graftavro").mode("overwrite").save(dir)
    val back = spark.read.format("graftavro").load(dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val a = src.agg(sum("l_orderkey"), sum("l_extendedprice")).head
    val b = back.agg(sum("l_orderkey"), sum("l_extendedprice")).head
    assert(a == b)
  }

  test("timestamps survive as timestamp-micros; embeddings as float arrays") {
    val dir = scratch("avro-ts")
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_orderstatus")
    src.write.format("graftavro").mode("overwrite").save(dir)
    val back = spark.read.format("graftavro").load(dir)
    assert(back.schema("o_orderdate").dataType == src.schema("o_orderdate").dataType)
    val a = src.agg(min("o_orderdate"), max("o_orderdate")).head
    val b = back.agg(min("o_orderdate"), max("o_orderdate")).head
    assert(a == b, s"timestamp drift: $a vs $b")

    val edir = scratch("avro-emb")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.write.format("graftavro").mode("overwrite").save(edir)
    val eback = spark.read.format("graftavro").load(edir)
    assert(eback.schema("embedding").dataType == emb.schema("embedding").dataType)
    val ea = emb.select(sum(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double")))).head.getDouble(0)
    val eb = eback.select(sum(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double")))).head.getDouble(0)
    assert(math.abs(ea - eb) < 1e-9)
  }

  test("nulls, maps and nested structs round-trip; unsupported types fail loudly") {
    import spark.implicits._
    val dir = scratch("avro-nest")
    val src = Seq(
      (1L, Some("a"), Map("k" -> 1L), (10, "x")),
      (2L, None, Map.empty[String, Long], (20, "y"))
    ).toDF("id", "opt", "m", "s")
    src.write.format("graftavro").mode("overwrite").save(dir)
    val back = spark.read.format("graftavro").load(dir)
    assert(back.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
    val bad = Seq((BigDecimal(1), 1)).toDF("d", "i")
    val e = intercept[Exception] {
      bad.write.format("graftavro").mode("overwrite").save(scratch("avro-bad"))
    }
    assert(e.getMessage != null)
  }

  test("column pruning reaches the scan (readSchema = required columns only)") {
    val dir = scratch("avro-prune")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_discount")
      .write.format("graftavro").mode("overwrite").save(dir)
    val q = spark.read.format("graftavro").load(dir).select("l_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[l_orderkey]"),
      s"pruned scan should only carry l_orderkey:\n$plan")
    assert(q.distinct().count() > 0)
  }
  test("COUNT(*) pushes to block headers; filtered/grouped counts keep the real scan") {
    import spark.implicits._
    val dir = scratch("avro-cnt")
    spark.range(12345).selectExpr("id", "id * 2 AS v").repartition(3)
      .write.format("graftavro").mode("overwrite").save(dir)
    val t = spark.read.format("graftavro").load(dir)
    val agg = t.groupBy().count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("COUNT(block headers)"), s"count not pushed:\n$plan")
    assert(agg.collect().head.getLong(0) == 12345L)
    // a filtered count can't come from block headers — must NOT push
    val filtered = t.where(col("v") > 100L).groupBy().count()
    val fp = filtered.queryExecution.executedPlan.toString
    assert(!fp.contains("COUNT(block headers)"),
      s"filtered count wrongly pushed:\n$fp")
    assert(filtered.collect().head.getLong(0) == 12345L - 51L)
    // grouped counts carry group keys the headers don't have
    val grouped = t.groupBy((col("id") % 2L).as("k")).count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("COUNT(block headers)"))
    assert(grouped.collect().map(_.getLong(1)).sum == 12345L)
  }

  test("overwrite truncates prior container files (no silent doubling)") {
    import spark.implicits._
    val dir = scratch("avro-trunc")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.write.format("graftavro").mode("overwrite").save(dir)
    df.write.format("graftavro").mode("overwrite").save(dir)
    // second overwrite must REPLACE, not accumulate uuid-unique parts
    assert(spark.read.format("graftavro").load(dir).count() == 2,
      "re-export into the same dir doubled the rows")
  }

  test("commit reconciles orphans: unreported part files deleted, pre-existing kept") {
    import spark.implicits._
    val dir = scratch("avro-orphan")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.write.format("graftavro").mode("overwrite").save(dir)
    def names() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.getName).toSet
    val pre = names()
    // drive a BatchWrite by hand in APPEND mode: two task writers open
    // files, but only one reports a commit message — the other simulates
    // a task killed before abort() (or a speculative duplicate attempt),
    // whose uuid-named file would otherwise be silently read as data
    val bw = new AvroBatchWrite(dir, df.schema, truncate = false)
    val factory = bw.createBatchWriterFactory(
      new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
        override def numPartitions(): Int = 2
      })
    val committedMsg = factory.createWriter(0, 0L).commit()
    factory.createWriter(1, 1L) // orphan: never commits, never aborts
    assert(names().size == pre.size + 2, "both task files should exist pre-commit")
    bw.commit(Array(committedMsg))
    val after = names()
    assert(after.size == pre.size + 1, s"orphan not reaped: $after")
    assert(pre.subsetOf(after), "reconcile must never touch pre-existing files")
    // the directory reads back exactly the committed rows
    assert(spark.read.format("graftavro").load(dir).count() == 2)
  }
}
