package graft

import org.apache.spark.sql.functions._

/** q32_zorder computes the Morton key; this spec proves the LAYOUT claim
  * behind it: writing `repartitionByRange(zkey)` produces files whose zkey
  * ranges are disjoint, and because the Morton curve interleaves both
  * dimensions, every file covers a BOUNDED box in (custkey, orderdate)
  * space — which is exactly what parquet row-group min/max stats need for
  * a filter on EITHER dimension to skip most files. A single-dimension
  * sort gives tight boxes on one axis and full-width boxes on the other;
  * z-order bounds both. */
class ZorderLayoutSpec extends SparkSpec {

  private def zkeyExpr: String = {
    val terms = (0 until 10).flatMap { i =>
      Seq(s"((zx div ${1L << i}) % 2) * CAST(${1L << (2 * i)} AS BIGINT)",
          s"((zy div ${1L << i}) % 2) * CAST(${1L << (2 * i + 1)} AS BIGINT)")
    }
    terms.mkString("(", " + ", ")")
  }

  test("repartitionByRange on the z-key yields disjoint file ranges with bounded 2-D boxes") {
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .withColumn("zx", expr("CAST(o_custkey % 1024 AS BIGINT)"))
      .withColumn("zy", expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') % 1024 AS BIGINT)"))
      .withColumn("zkey", expr(zkeyExpr))
      .repartitionByRange(8, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(s"$out/orders_z")

    val files = spark.read.parquet(s"$out/orders_z")
      .groupBy(input_file_name().as("f"))
      .agg(min("zkey").as("zmin"), max("zkey").as("zmax"),
        min("zx").as("xmin"), max("zx").as("xmax"),
        min("zy").as("ymin"), max("zy").as("ymax"),
        count(lit(1)).as("n"))
      .collect()
    assert(files.length >= 4, s"expected several files, got ${files.length}")

    // 1. disjoint zkey ranges across files (range partitioning did its job)
    val ranges = files.map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping ranges: $hi vs $lo2")
      case _ => ()
    }

    // 2. bounded 2-D boxes: the average per-file span in EACH dimension
    // must be well below the full domain (a 1-D sort on o_custkey would
    // leave the date span at ~full width in every file). The z-curve with
    // 8 files splits ~3 high bits → each file's box should span ≤ ~1/2 of
    // each axis on average; assert < 70% for slack on boundary files.
    val domainX = files.map(_.getAs[Long]("xmax")).max - files.map(_.getAs[Long]("xmin")).min
    val domainY = files.map(_.getAs[Long]("ymax")).max - files.map(_.getAs[Long]("ymin")).min
    val avgSpanX = files.map(r => r.getAs[Long]("xmax") - r.getAs[Long]("xmin")).sum.toDouble / files.length
    val avgSpanY = files.map(r => r.getAs[Long]("ymax") - r.getAs[Long]("ymin")).sum.toDouble / files.length
    info(f"avg per-file span: x ${avgSpanX / domainX * 100}%.0f%% of domain, y ${avgSpanY / domainY * 100}%.0f%%")
    assert(avgSpanX < 0.7 * domainX, s"x spans not bounded: $avgSpanX of $domainX")
    assert(avgSpanY < 0.7 * domainY, s"y spans not bounded: $avgSpanY of $domainY")
  }
}
