package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ss20 operating-point sweep's point table ([[IvfPqSweep]]):
  * the round-15 adopt-or-keep adjudication quotes IVFPQAB.json keys as
  * if they name the parameters they ran — so the key MUST be derived
  * from those parameters, the shipped catalog point must be in the
  * sweep (a keep-decision that never measured the incumbent is not an
  * A/B), and keys must be unique (duplicate JSON keys silently drop a
  * point, the RewriteAb factor-key lesson). Pure — no SparkSession. */
class IvfPqSweepSpec extends AnyFunSuite {

  test("every sweep label encodes exactly its (nprobe, m, cb) parameters") {
    IvfPqSweep.points.foreach { case (lbl, np, m, cb) =>
      assert(lbl === s"np${np}_m${m}_cb$cb")
    }
  }

  test("labels are unique JSON keys") {
    val lbls = IvfPqSweep.points.map(_._1)
    assert(lbls.distinct.size === lbls.size)
  }

  test("the shipped ss20 configuration (nprobe=2, m=8, cb=16) is swept") {
    assert(IvfPqSweep.points.exists(_ == ("np2_m8_cb16", 2, 8, 16)))
  }

  test("both dials move around the shipped point: nprobe at fixed tree," +
      " tree at fixed nprobe") {
    val pts = IvfPqSweep.points.toSet
    // nprobe dial at the shipped (m=8, cb=16) tree, both directions
    assert(pts.exists { case (_, np, m, cb) => np < 2 && m == 8 && cb == 16 })
    assert(pts.exists { case (_, np, m, cb) => np > 2 && m == 8 && cb == 16 })
    // smaller trees at the shipped nprobe=2: fewer subquantizers and
    // fewer codes, each alone
    assert(pts.contains(("np2_m4_cb16", 2, 4, 16)))
    assert(pts.contains(("np2_m8_cb8", 2, 8, 8)))
  }
}
