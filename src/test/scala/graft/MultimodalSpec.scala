package graft

import graft.analytics.Multimodal

/** Multimodal binary plumbing: schema, batched decode, frame sampling.
  * The decode itself is a documented deterministic stub (no codecs in the
  * container) — these tests pin the Spark-side contract. */
class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("media table has the binary+metadata schema") {
    val m = Multimodal.mediaTable(spark, dir)
    val fields = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("content") == "binary")
    assert(fields("kind") == "string")
    assert(fields("meta_w") == "int")
    assert(m.count() > 0)
  }

  test("batched feature extraction: one digest + fixed-dim vector per item, deterministic") {
    val m = Multimodal.mediaTable(spark, dir).limit(50)
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 50)
    assert(f1.forall(_.features.length == Multimodal.DecodeStub.dim))
    assert(f1.forall(_.digest.length == 16))
    // repartition-invariant (decode is a pure per-item function)
    assert(f1.map(x => (x.media_id, x.digest, x.features.toSeq)).toSeq ==
      f2.map(x => (x.media_id, x.digest, x.features.toSeq)).toSeq)
  }

  test("frame sampling explodes video payloads into indexed frames") {
    val m = Multimodal.mediaTable(spark, dir)
    val frames = Multimodal.sampleFrames(m, everyNthByte = 64)
    val row = frames.filter("media_id = 2").orderBy("frame_idx").collect()
    assert(row.nonEmpty)
    assert(row.head.getAs[Int]("frame_idx") == 0)
    assert(row.forall(_.getAs[Array[Byte]]("frame_bytes").length <= 64))
  }

  test("cross-modal retrieval census separates matched pairs and never IVF-misses a matched even query") {
    // The (2k, 2k+1)-share-image-2k plant as retrieval ground truth: an
    // EVEN query IS its own image, so (a) exact search must rank the
    // matched pair (hit_pair_exact = 1), and (b) the IVF path can never
    // miss it — the query and its image are cell-coincident by
    // construction (identical embedding, identical centroid argmax), so
    // hit_pair_ivf = 1 too. ODD queries are the mismatched plant
    // (cross-modal cosine ~0): their paired image should essentially
    // never make the exact top-5 — the separation that makes the census
    // a retrieval eval rather than a tautology. Also pins the recall
    // overlap as non-vacuous and bounded.
    val rows = graft.analytics.LlmOps.mmRetrievalRecall(spark, dir).collect()
    val (even, odd) = rows.partition(_.getAs[Long]("qid") % 2 == 0)
    assert(even.nonEmpty && odd.nonEmpty, s"need both parities: ${rows.length} rows")
    assert(even.forall(r => r.getAs[Long]("hit_pair_exact") == 1L),
      "every even (matched) query must find its own image exactly")
    assert(even.forall(r => r.getAs[Long]("hit_pair_ivf") == 1L),
      "IVF cannot miss a cell-coincident matched pair")
    val oddExact = odd.map(_.getAs[Long]("hit_pair_exact")).sum.toDouble / odd.length
    assert(oddExact < 0.5, s"mismatched odd pairs should rarely hit: $oddExact")
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hits_ivf")
      h >= 0 && h <= 5 && r.getAs[Double]("recall_ivf") == h / 5.0
    })
    assert(rows.exists(_.getAs[Long]("hits_ivf") > 0), "IVF side vacuous")
  }
}
