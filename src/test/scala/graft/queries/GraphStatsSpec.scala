package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** q73's stat block (Dedup.graphStats) under adversarial graph shapes —
  * specifically the boilerplate-hub case the TRIANGLE_DEGREE_CAP exists
  * for: triangle enumeration is Σ per-node deg², so a 10k-degree hub in
  * the MIDDLE of canonical edges (in-edges ⋈ out-edges through it) would
  * otherwise materialize 10k × 10k = 10⁸ join rows. With the cap, the
  * hub's edges are anti-joined out before the enumeration: the spec
  * completes in ordinary test time AND still counts triangles among the
  * non-hub remainder, while the histogram/excluded_hubs rows keep the
  * hub visible for QA. */
class GraphStatsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def stats(edges: Seq[(Long, Long)], cap: Long): Map[String, Long] = {
    import spark.implicits._
    Dedup.graphStats(edges.toDF("doc_a", "doc_b"), cap).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("a 10k-degree mid-hub is excluded from triangles but stays in the histogram") {
    val h = 50000L
    val star = (1L to 10000L).map(i => (i, h)) ++
      (1L to 10000L).map(j => (h, h + j))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val s = stats(star ++ tri, cap = 1000L)
    s("excluded_hubs") shouldBe 1L
    // the planted non-hub triangle still counts; the 10⁸-row hub
    // wedge enumeration never runs
    s("triangles") shouldBe 1L
    s("nodes") shouldBe 20001L
    s("edges") shouldBe 20003L
    s("deg_20000") shouldBe 1L // the hub is REPORTED, just not enumerated
    s("deg_3") shouldBe 3L // nodes 1,2,3: hub edge + two triangle edges
  }

  test("below the cap nothing is excluded and triangles count in full") {
    val s = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), cap = 1000L)
    s("excluded_hubs") shouldBe 0L
    s("triangles") shouldBe 1L
    s("nodes") shouldBe 4L
    s("edges") shouldBe 4L
  }

  test("cap boundary: degree == cap is kept, degree == cap+1 is excluded") {
    // star of degree 3 around node 0 (canonical: 0 < everything)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    stats(star, cap = 3L)("excluded_hubs") shouldBe 0L
    stats(star, cap = 2L)("excluded_hubs") shouldBe 1L
  }
}
