package graft.ops

import graft.SparkSpec

/** Profile's scale contract: the DEFAULT distinct estimator is an HLL
  * sketch — one narrow aggregation pass with NO Expand in the plan — and
  * exact `count(distinct)` (which Expands the scan N-columns-fold) is
  * opt-in for modest inputs. */
class ProfileSpec extends SparkSpec {

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private val cols =
    Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")

  test("default (sketch) profile plans with no Expand; exact opt-in Expands") {
    val sketch = Profile.profile(orders, cols)
    sketch.collect()
    val sp = sketch.queryExecution.executedPlan.toString
    assert(!sp.contains("Expand"),
      s"sketch profile must not Expand the scan:\n$sp")

    val exact = Profile.profile(orders, cols, exact = true)
    exact.collect()
    val ep = exact.queryExecution.executedPlan.toString
    assert(ep.contains("Expand"),
      "witness failed: exact multi-distinct should plan through Expand " +
        s"(did Catalyst change?):\n$ep")
  }

  test("sketch profile matches exact on nulls/min/max, distinct within rsd") {
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
        .toMap
    val sk = byCol(Profile.profile(orders, cols, rsd = 0.02))
    val ex = byCol(Profile.profile(orders, cols, exact = true))
    assert(sk.keySet == ex.keySet)
    for (c <- cols) {
      val (sn, snull, sdist, smin, smax) = sk(c)
      val (en, enull, edist, emin, emax) = ex(c)
      assert(sn == en && snull == enull && smin == emin && smax == emax,
        s"non-distinct stats must be exact for $c")
      val err = math.abs(sdist - edist).toDouble / math.max(edist, 1L)
      assert(err <= 0.10, s"$c: sketch distinct $sdist vs exact $edist " +
        f"(err $err%.3f) outside tolerance")
    }
  }

  test("histogram: buckets partition [min,max], counts sum to row count") {
    val h = Profile.histogram(orders, "o_totalprice", 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(h.map(_._1).forall(b => b >= 0 && b < 20))
    assert(h.map(_._4).sum == orders.count())
    // contiguous bucket bounds: each hi equals the next bucket's lo when
    // adjacent ids are present
    h.sliding(2).foreach {
      case Array(a, b) if b._1 == a._1 + 1 =>
        assert(math.abs(a._3 - b._2) < 1e-6, s"gap between ${a._1} and ${b._1}")
      case _ => ()
    }
  }

  test("equi-depth: buckets hold ~equal counts, ranges tile without overlap") {
    val h = Profile.equiDepthHistogram(orders, "o_totalprice", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(h.map(_._1).toSeq == (0L to 9L))
    val total = orders.count()
    assert(h.map(_._2).sum == total)
    // equal frequency within the quantile-boundary rounding (±1 row of N/10)
    h.foreach { case (b, n, _, _) =>
      assert(math.abs(n - total / 10.0) <= total / 10.0 * 0.05 + 2,
        s"bucket $b holds $n of $total — not equi-depth")
    }
    // ranges ordered and non-overlapping
    h.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3 && a._3 <= a._4)
      case _ => ()
    }
  }

  test("histogram: constant column degenerates to a single bucket") {
    import spark.implicits._
    val h = Profile.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", 20).collect()
    assert(h.length == 1 && h.head.getLong(0) == 0L && h.head.getLong(3) == 3L)
  }
}
