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

  test("the r15–r18 ss20 configuration (nprobe=2, m=8, cb=16) is swept") {
    // the bundled-cost-model incumbent stays in the full-run sweep so
    // the r15 keep and the r19 serve-split adoption both remain
    // re-measurable against it
    assert(IvfPqSweep.points.exists(_ == ("np2_m8_cb16", 2, 8, 16)))
  }

  test("serve-split labels encode their parameters and are unique") {
    IvfPqSweep.servePoints.foreach { case (lbl, np, m, cb) =>
      assert(lbl === s"serve_np${np}_m${m}_cb$cb")
    }
    val all = (IvfPqSweep.points ++ IvfPqSweep.servePoints).map(_._1)
    assert(all.distinct.size === all.size)
  }

  test("serve sweep covers the incumbent, the adopted point, the probe" +
      " ceiling, and a finer tree") {
    val pts = IvfPqSweep.servePoints.toSet
    // the r15–r18 incumbent — a re-adjudication must measure it
    assert(pts.exists { case (_, np, m, cb) => np == 2 && m == 8 && cb == 16 })
    // the round-19 ADOPTED catalog operating point (nprobe=4, m=8,
    // cb=32) — a future re-sweep must keep measuring the incumbent
    assert(pts.contains(("serve_np4_m8_cb32", 4, 8, 32)))
    // exhaustive probe of all numCoarse=8 cells = the PQ recall ceiling
    // at the old tree — separates nprobe loss from quantizer loss
    assert(pts.exists { case (_, np, m, cb) => np == 8 && m == 8 && cb == 16 })
    // at least one finer quantizer (more codes or more subspaces) that
    // could lift the ceiling toward the ~0.9 target
    assert(pts.exists { case (_, _, m, cb) => cb > 16 || m > 8 })
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
