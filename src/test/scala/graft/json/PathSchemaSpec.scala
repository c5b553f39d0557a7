package graft.json

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The parse-once projection must be a drop-in for per-field
  * `get_json_object`: same values, same null-on-absent, same typed
  * try_cast behavior — locked differentially over generated documents. */
class PathSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(_.toString),
    Gen.alphaLowerStr.map(s => "\"" + s.take(6) + "\""),
    Gen.oneOf("true", "false", "null"),
    Gen.const("\"2017-03-01T10:00:00Z\""))

  /** Random docs over a fixed universe of nested paths; fields present or
    * absent per doc. */
  private val docGen: Gen[String] = for {
    a <- Gen.option(scalarGen)
    b <- Gen.option(scalarGen)
    c <- Gen.option(scalarGen)
    d <- Gen.option(scalarGen)
  } yield {
    val inner = Seq(b.map(v => s""""id": $v"""), c.map(v => s""""login": $v"""))
      .flatten.mkString(", ")
    val parts = Seq(
      a.map(v => s""""top": $v"""),
      if (inner.nonEmpty) Some(s""""user": {$inner}""") else None,
      d.map(v => s""""meta": {"deep": {"leaf": $v}}""")
    ).flatten
    "{" + parts.mkString(", ") + "}"
  }

  private val paths = Seq("top", "user.id", "user.login", "meta.deep.leaf",
    "missing.path")

  test("property: parse-once string extraction ≡ get_json_object over random docs") {
    val docs = samples(docGen, 40)
    val df = docs.toDF("data")
    val schema = PathSchema.forPaths(paths)
    val parsed = from_json(col("data"), schema)
    val viaParse = df.select(paths.map(p => PathSchema.at(parsed, p)): _*).collect()
    val viaGjo = df.select(paths.map(p => get_json_object(col("data"), "$." + p)): _*).collect()
    viaParse.zip(viaGjo).zip(docs).foreach { case ((a, b), doc) =>
      assert(a == b, s"diverged on $doc: parse=$a gjo=$b")
    }
  }

  test("property: typed try_cast agrees between the two spellings") {
    val docs = samples(docGen, 40)
    val df = docs.toDF("data")
    val schema = PathSchema.forPaths(paths)
    val parsed = from_json(col("data"), schema)
    for (t <- Seq("int", "boolean", "timestamp")) {
      val a = df.select(paths.map(p => PathSchema.at(parsed, p).try_cast(t)): _*).collect()
      val b = df.select(paths.map(p =>
        get_json_object(col("data"), "$." + p).try_cast(t)): _*).collect()
      a.zip(b).zip(docs).foreach { case ((x, y), doc) =>
        assert(x == y, s"type $t diverged on $doc: parse=$x gjo=$y")
      }
    }
  }

  test("typed array leaves parse in the same pass") {
    val schema = PathSchema.forTypedPaths(Seq(
      "payload.items" -> ArrayType(StringType), "payload.kind" -> StringType))
    val df = Seq("""{"payload": {"kind": "k", "items": ["a", "b"]}}""").toDF("data")
    val parsed = from_json(col("data"), schema)
    val r = df.select(PathSchema.at(parsed, "payload.items"),
      PathSchema.at(parsed, "payload.kind")).head()
    assert(r.getSeq[String](0) == Seq("a", "b") && r.getString(1) == "k")
  }

  test("leaf shadowed by a longer path reports !isLeaf (falls back to jstr)") {
    val schema = PathSchema.forPaths(Seq("repo", "repo.id"))
    assert(!PathSchema.isLeaf(schema, "repo"))
    assert(PathSchema.isLeaf(schema, "repo.id"))
  }
}
