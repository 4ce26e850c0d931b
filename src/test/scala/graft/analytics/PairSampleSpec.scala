package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the round-18 full-pair-state changes: the deterministic
  * ':jpair' doc-sample ladder that scale-bounds the last superlinear state
  * build, and the recall gate that makes a cap-saturated corpus fail the
  * banded dedup ACTION loudly instead of silently under-dropping. In the
  * same package as the ops so the private[analytics] state builders are
  * testable directly. */
case class PairSampleDoc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

class PairSampleSpec extends SparkSpec {
  private type D = PairSampleDoc
  private val D = PairSampleDoc

  private def writeDocs(rows: Seq[D]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("pairsample").toString
    rows.toDF().write.parquet(s"$d/documents.parquet")
    d
  }

  test("sample ladder: full through sf1 scale, 70% at sf2 scale, 45% beyond") {
    assert(LlmOps.jpairLadder(500L) == 65536)
    assert(LlmOps.jpairLadder(60000L) == 65536) // sf1 (50k) keeps everything
    assert(LlmOps.jpairLadder(60001L) == 45875)
    assert(LlmOps.jpairLadder(150000L) == 45875) // sf2 (100k) keeps ~70%
    assert(LlmOps.jpairLadder(150001L) == 29491) // sf10 (500k) keeps ~45%
  }

  test("sampled pair state is exactly the full state restricted to sampled docs") {
    // 12 groups of 3 identical docs: the full state holds 3 pairs per
    // group. Under a forced 50% threshold, the sampled state must equal
    // the full state restricted to pairs whose BOTH endpoints pass the
    // deterministic ':jpair' draw — same common/denominators/jaccard on
    // every surviving pair (the stop-shingle df census and the size
    // denominators are computed on the FULL corpus in both builds).
    // token-DISJOINT groups: zero cross-group shingle overlap, so the
    // full state is exactly the 36 within-group pairs (well under
    // ddNgramJaccard's top-200 cut — the restriction comparison below
    // must not race a truncation)
    val texts = (0 until 12).map(g =>
      (0 until 12).map(t => s"g${g}tok$t").mkString(" "))
    val rows = for (g <- 0 until 12; m <- 0 until 3)
      yield D(g * 3L + m, texts(g), "en", "s", texts(g).length.toLong)
    val dirA = writeDocs(rows) // sampled build
    val dirB = writeDocs(rows) // full build (fresh dir => fresh memo key)
    def pairs(d: String) = LlmOps.ddNgramJaccard(spark, d).collect()
      .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib")) -> r.getAs[Double]("jaccard"))
      .toMap
    val sampled =
      try { sys.props("GRAFT_JPAIR_SAMPLE_P") = "32768"; pairs(dirA) }
      finally sys.props.remove("GRAFT_JPAIR_SAMPLE_P")
    val full = pairs(dirB)
    // the draw as the engine computes it (jpairDraw's SQL, evaluated here)
    val inSample = spark.read.parquet(s"$dirA/documents.parquet")
      .filter(expr(s"${LlmOps.jpairDraw("doc_id")} < 32768"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(inSample.nonEmpty && inSample.size < rows.size,
      s"draw degenerate: ${inSample.size} of ${rows.size} sampled")
    val expected = full.filter { case ((a, b), _) => inSample(a) && inSample(b) }
    assert(sampled == expected,
      s"sampled state diverged: extra=${sampled.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- sampled.keySet}")
    assert(expected.nonEmpty, "vacuous: no pair survived the sample")
    assert(expected.size < full.size, "vacuous: sampling dropped no pair")
  }

  test("dedup actions REFUSE a corpus where the banded edge set is lossy; the escape hatch and the census still work") {
    // The round-17 advice item: the action consumers' oracles derive
    // >=0.8 edges from the full state while the engine rides the capped
    // bands — so a band-cap-saturated corpus (here: 310 identical docs
    // vs the 64-doc bucket cap) must fail LOUDLY at edge-memo build
    // time, not silently under-drop. The band-gap census itself bypasses
    // the gate (it is the loss-sizing diagnostic), and the documented
    // escape hatch lets an operator dedup lossily on purpose.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = writeDocs((0L until 310L).map(i => D(i, text, "en", "s", text.length.toLong)))
    val e = intercept[IllegalStateException](LlmOps.ddCluster(spark, d).collect())
    assert(e.getMessage.contains("LOSSY") && e.getMessage.contains("dd_band_gap"),
      s"gate message must name the loss and the diagnostic: ${e.getMessage}")
    // the diagnostic is not gated: recall readout stays available
    val gap = LlmOps.ddBandGap(spark, d).collect().head
    assert(gap.getAs[Double]("recall") < 0.05)
    // escape hatch: the action runs (lossily) when explicitly unlocked
    val unlocked =
      try { sys.props("GRAFT_UNGATED_EDGES") = "1"; LlmOps.ddCluster(spark, d).collect() }
      finally sys.props.remove("GRAFT_UNGATED_EDGES")
    assert(unlocked.nonEmpty, "unlocked action must produce clusters")
  }
}
