package graft

import graft.analytics.LlmOps

/** txt_pack_ffd: the length-descending packing must fill the 64-token
  * sequence budget at least as well as v1's arrival-order packing.
  * Fill-rate counts min(n_toks_total, 64)/64 per sequence — tokens past
  * the budget are overflow a trainer truncates, so an overfull sequence
  * is no better than a full one. */
class PackingSpec extends SparkSpec {

  private def fillRate(rows: Array[org.apache.spark.sql.Row]): Double = {
    val fills = rows.map(r => math.min(r.getAs[Long]("n_toks_total"), 64L) / 64.0)
    fills.sum / fills.length
  }

  test("length-desc packing fills sequences at least as tightly as arrival order") {
    val dir = "/root/testdata/sf0.001"
    val v1 = LlmOps.txtPack(spark, dir).collect()
    val ffd = LlmOps.txtPackFfd(spark, dir).collect()

    // both pack the same token mass
    assert(v1.map(_.getAs[Long]("n_toks_total")).sum ==
      ffd.map(_.getAs[Long]("n_toks_total")).sum)

    val (rv1, rffd) = (fillRate(v1), fillRate(ffd))
    assert(rffd >= rv1, f"ffd fill $rffd%.4f < v1 fill $rv1%.4f")
  }
}
