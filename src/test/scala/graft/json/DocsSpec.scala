package graft.json

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Null-lenient extraction + FlatJson-fidelity flatten (SURVEY.md §1.2). */
class DocsSpec extends SparkSpec {
  import spark.implicits._

  private val doc =
    """{"author":{"id":42,"login":"alice","admin":true},
      |"when":"2017-03-01T01:02:03Z","num":"abc",
      |"files":[{"filename":"a.scala"},{"filename":"b.scala"}]}""".stripMargin.replace("\n", "")

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(doc).toDF("data").select(c.as("v")).head().get(0)

  test("jstr/jint/jbool/jts extract typed values") {
    assert(one(Docs.jstr(col("data"), "author.login")) == "alice")
    assert(one(Docs.jint(col("data"), "author.id")) == 42)
    assert(one(Docs.jbool(col("data"), "author.admin")) == true)
    assert(one(Docs.jts(col("data"), "when")).toString == "2017-03-01 01:02:03.0")
    assert(one(Docs.jstr(col("data"), "files[1].filename")) == "b.scala")
  }

  test("absent path and type mismatch extract null, never fail (Get* contract)") {
    assert(one(Docs.jstr(col("data"), "missing.path")) == null)
    assert(one(Docs.jint(col("data"), "num")) == null) // "abc" → null
    assert(one(Docs.jts(col("data"), "author.login")) == null)
  }

  test("flatten produces the reference's path[i].field key syntax") {
    val m = Docs.flatten(doc)
    assert(m("author.id") == "42")
    assert(m("author.login") == "alice")
    assert(m("files[0].filename") == "a.scala")
    assert(m("files[1].filename") == "b.scala")
    assert(!m.contains("files"))
  }

  test("flatten on malformed json is null (silent: true)") {
    assert(Docs.flatten("{nope") == null)
    assert(Docs.flatten(null) == null)
  }
}
