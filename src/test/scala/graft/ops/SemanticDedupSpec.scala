package graft.ops

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // dim-4 fixture: ids 0/2 are the same direction (cos = 1), ids 1/3 the
  // same other direction; id 4 is equidistant (cos 0.5) from both — no dup.
  // Centroids = ids < 2, so each dup pair shares its nearest centroid.
  private def fixture = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(2f, 0f, 0f, 0f)),
    (3L, Array(0f, 3f, 0f, 0f)),
    (4L, Array(0.5f, 0.5f, 0.5f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("semanticDedup groups same-direction vectors, keeps min id, leaves singletons") {
    val out = Ann.semanticDedup(fixture, "vec_id", "embedding", dim = 4,
        threshold = 0.95, numCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (0L, 0L, true), (2L, 0L, false),
      (1L, 1L, true), (3L, 1L, false),
      (4L, 4L, true)))
  }

  test("threshold above every cosine → everyone keeps themselves") {
    val out = Ann.semanticDedup(fixture, "vec_id", "embedding", dim = 4,
        threshold = 1.5, numCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == (0L to 4L).map(i => (i, i, true)).toSet)
  }

  test("transitive chain A~B~C collapses into one component even when A,C are not a pair") {
    // unit vectors at 0°, 7°, 14°: adjacent cos ≈ 0.9925 ≥ 0.99, but the
    // 0°-14° pair is cos ≈ 0.9703 < 0.99 — only the bridge connects them
    val chain = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99255f, 0.12187f, 0f, 0f)),
      (2L, Array(0.97030f, 0.24192f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.semanticDedup(chain, "vec_id", "embedding", dim = 4,
        threshold = 0.99, numCentroids = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 0L), (1L, 0L), (2L, 0L)))
  }
}
