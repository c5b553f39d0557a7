package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The boundary-offset semantics both file-drop streams share. The
  * prefix-count spelling this replaced both duplicated and lost files
  * when a late arrival carried an mtime equal to processed files (coarse
  * store timestamp granularity): the count-based slice shifted. */
class StreamListingSpec extends AnyFunSuite {
  import StreamListing._

  private val l1 = Seq(("/d/a", 5L, 1L), ("/d/c", 5L, 1L))

  test("boundary after a trigger covers exactly the processed entries") {
    val b = latest(l1)
    assert(b == Boundary(5L, "/d/c"))
    assert(between(l1, Start, b).map(_._1) == Seq("/d/a", "/d/c"))
    assert(between(l1, b, b).isEmpty)
  }

  test("same-mtime late arrival: no duplicates; later-sorting file picked up") {
    val b1 = latest(l1)
    // d@5 sorts AFTER the boundary → new; b@5 sorts before → the
    // documented residual (ascending-name same-granule contract); and
    // crucially c is NOT re-read (the prefix-count bug's duplicate)
    val l2 = Seq(("/d/a", 5L, 1L), ("/d/b", 5L, 1L),
      ("/d/c", 5L, 1L), ("/d/d", 5L, 1L))
    assert(between(l2, b1, latest(l2)).map(_._1) == Seq("/d/d"))
    // a strictly-newer mtime is always new
    val l3 = l2 :+ ("/d/e", 6L, 1L)
    assert(between(l3, b1, latest(l3)).map(_._1) == Seq("/d/d", "/d/e"))
  }

  test("offsets serialize and parse; legacy fileCount form converts") {
    val b = Boundary(5L, "/weird/\"quo\\te\n")
    assert(parse(b.json, Seq.empty) == b)
    assert(parse("""{"fileCount":2}""", l1) == Boundary(5L, "/d/c"))
    assert(parse("""{"fileCount":0}""", l1) == Start)
    intercept[IllegalArgumentException](parse("{}", Seq.empty))
  }

  test("Start covers nothing; empty listing yields Start") {
    assert(latest(Seq.empty) == Start)
    assert(!Start.covers(Long.MinValue + 1, ""))
    assert(between(l1, Start, latest(l1)).size == 2)
  }
}
