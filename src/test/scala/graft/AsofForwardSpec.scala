package graft

import graft.analytics.{Relational, Tables}

/** Brute-force parity for the FORWARD as-of join (q37): the single-pass
  * window formulation must agree row-for-row with the naive per-view
  * "earliest strictly-later purchase" scan it replaces — including the
  * (ts, event_id) tie order and the 3-day conversion horizon. The naive
  * scan is only feasible at sf0.001 (it is the O(n²) shape the window
  * avoids), which is exactly what makes it a usable oracle here. */
class AsofForwardSpec extends SparkSpec {

  test("forward as-of equals the brute-force earliest-later-purchase scan, horizon included") {
    val dir = "/root/testdata/sf0.001"
    val horizonNs = 259200L * 1000000000L
    val got = Relational.q37AsofForward(spark, dir).collect().map(r =>
      (r.getAs[Long]("view_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("next_purchase_id"), r.getAs[Long]("secs_to_purchase")))
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "ts").collect().map(r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts")))
    val want = ev.groupBy(_._2).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._1)) // the window's (ts, event_id) order
      ordered.zipWithIndex.flatMap {
        case ((vid, _, "view", vts), i) =>
          ordered.drop(i + 1).find(_._3 == "purchase").collect {
            case (pid, _, _, pts) if pts - vts <= horizonNs =>
              (vid, uid, pid, (pts - vts) / 1000000000L)
          }
        case _ => None
      }
    }.sortBy(_._1)
    assert(got.nonEmpty, "sf0.001 must contain converted views")
    assert(got.toSeq == want, "window formulation diverges from the naive scan")
    // horizon is a filter, not a re-attribution: every emitted conversion
    // is within bounds and non-negative
    assert(got.forall(r => r._4 >= 0 && r._4 <= 259200L))
  }
}
