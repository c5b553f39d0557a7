package graft.ops

import graft.SparkSpec

class AnnSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy corpus: 0‖1 (parallel), 2 orthogonal to both, 3 ≈ 0
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(2f, 0f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(0.9f, 0.1f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks exact neighbors, excludes self, breaks ties by id") {
    val out = Ann.cosineTopK(vecs, vecs, "vec_id", "embedding", 4, 2)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    assert(out(0L) == Seq(1L, 3L)) // parallel first, then near-parallel
    assert(out(1L) == Seq(0L, 3L))
    assert(out(2L).head == 3L)     // only 3 has any y-component
  }

  test("cosine values are exact") {
    val rows = Ann.cosineTopK(vecs, vecs, "vec_id", "embedding", 4, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(rows((0L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(rows((0L, 2L)) - 0.0) < 1e-12)
  }

  test("ivfTopK searches only within the probed cluster") {
    // centroids = ids < 2: x-axis and y-axis; 2 lands in cluster 0, 3 in 1
    val clustered = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0.1f, 0.9f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.ivfTopK(clustered, "vec_id", "embedding", 4, 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 2L), (2L, 0L), (1L, 3L), (3L, 1L)))
  }

  test("multi-probe IVF recovers cross-cluster neighbors nprobe=1 misses") {
    // centroids = ids < 2 (x-axis, y-axis); 2 lives in cluster 0 but its
    // second-closest cluster is 1 — with nprobe=2 it also sees 3 and 1
    val clustered = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0.1f, 0.9f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val single = Ann.ivfTopK(clustered, "vec_id", "embedding", 4, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Ann.ivfTopKProbed(clustered, "vec_id", "embedding", 4,
        k = 3, numCentroids = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi))      // more probes never lose neighbors
    assert(multi.contains((2L, 3L)))    // cross-cluster pair nprobe=1 missed
    assert(!single.contains((2L, 3L)))
    // nprobe = numCentroids degrades to brute force
    val brute = Ann.cosineTopK(clustered, clustered, "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Ann.ivfTopKProbed(clustered, "vec_id", "embedding", 4,
        k = 3, numCentroids = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
  }

  test("cosineDupPairs finds near-identical vectors above threshold") {
    val pairs = Ann.cosineDupPairs(vecs, "vec_id", "embedding", 4,
        threshold = 0.99, numCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }
}
