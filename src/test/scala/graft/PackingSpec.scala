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

  test("pack report recounts both composed packers; token mass agrees across strategies") {
    val dir = "/root/testdata/sf0.001"
    val report = LlmOps.txtPackReport(spark, dir).collect()
    val packers = Map(
      "arrival" -> LlmOps.txtPack(spark, dir).collect(),
      "length_desc" -> LlmOps.txtPackFfd(spark, dir).collect())
    assert(report.map(r => (r.getAs[String]("strategy"), r.getAs[String]("lang"))).distinct.length
      == report.length)
    report.foreach { r =>
      val rows = packers(r.getAs[String]("strategy"))
        .filter(_.getAs[String]("lang") == r.getAs[String]("lang"))
      val nSeqs = r.getAs[Long]("n_seqs")
      assert(nSeqs == rows.length.toLong)
      assert(r.getAs[Long]("n_chunks") == rows.map(_.getAs[Long]("n_chunks")).sum)
      assert(r.getAs[Long]("n_toks") == rows.map(_.getAs[Long]("n_toks_total")).sum)
      assert(r.getAs[Long]("max_seq_toks") == rows.map(_.getAs[Long]("n_toks_total")).max)
      assert(r.getAs[Double]("fill") == r.getAs[Long]("n_toks").toDouble / (nSeqs * 64))
    }
    // both strategies pack the same chunks: per-lang token mass is equal,
    // so the report isolates the comparison to n_seqs/fill
    report.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      assert(rows.map(_.getAs[Long]("n_toks")).distinct.length == 1,
        s"token mass disagrees across strategies for lang=$lang")
      assert(rows.map(_.getAs[Long]("n_chunks")).distinct.length == 1)
    }
  }
}
