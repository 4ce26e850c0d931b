package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A short untimed warmup (session init, parquet footers, codegen paths)
  * runs first so the first measured query isn't charged for JVM startup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: spin executors + touch every table's footer/schema,
    // then exercise the interpreted-lambda tokenize path and the codegen'd
    // dot product on a few rows so the first measured query isn't charged
    // for HotSpot/janino warmup of those evaluation paths.
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    try {
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .selectExpr(raw"explode(filter(split(lower(trim(text)), '\\s+'), t -> t != '')) AS t")
        .count()
      org.apache.spark.sql.graft.GraftFunctions.register(spark)
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        .selectExpr("dot_f(embedding, embedding)").count()
    } catch { case _: Throwable => () }

    // Explicitly timed one-time STATE builds (jaccard pairs table, passage
    // window memos, bucketed fact + fingerprint state tables) BEFORE the
    // query loop, so family members no longer absorb build cost into their
    // per-query floors (dd_align used to carry ~5s of jaccard state).
    // (name, seconds, error): a FAILED build must be visible — swallowed, it
    // is indistinguishable from a fast one, and its cost silently shifts back
    // into the first family query (the exact floor distortion the pre-stage
    // exists to remove).
    val stateTimes = (graft.analytics.LlmOps.stateBuilders(spark, sfDir) ++
      graft.analytics.Relational.stateBuilders(spark, sfDir)).map { case (name, f) =>
      val t0 = System.nanoTime()
      val err = try { f(); None } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("").linesIterator
            .find(_.nonEmpty).getOrElse("")
          Some(s"${e.getClass.getName}: $msg".take(300))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val stateTotal = stateTimes.map(_._2).sum

    // (name, seconds, error) — failures must be visible in the output, with
    // enough of the exception to tell a contended-box OOM from a code bug,
    // not silently folded into a normal-looking total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("").linesIterator
            .find(_.nonEmpty).getOrElse("")
          Some(s"${e.getClass.getName}: $msg".take(300))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      } + "\""
    // `failed` keeps the name-array shape older tooling reads; `errors` maps
    // each failed query to its exception class + first message line
    val failed = (results.collect { case (k, _, Some(_)) => s"\"" + k + "\"" } ++
      stateTimes.collect { case (k, _, Some(_)) => s"\"state:" + k + "\"" })
      .mkString("[", ",", "]")
    val errors = (results.collect { case (k, _, Some(e)) => s"\"" + k + "\":" + jstr(e) } ++
      stateTimes.collect { case (k, _, Some(e)) => s"\"state:" + k + "\":" + jstr(e) })
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def line(fmt: Double => String, stateDetail: Boolean, failParts: Boolean): String = {
      val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val st = if (stateDetail)
        stateTimes.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
          .mkString("\"state_build\":{", ",", "},")
      else ""
      val fp = if (failParts) s""""failed":$failed,"errors":$errors,""" else ""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        st + s""""state_build_sec":${fmt(stateTotal)},""" + fp + s""""sf":"$sfDir"}"""
    }
    // Full precision + per-item state detail goes to a FILE (the driver's
    // stdout capture keeps only a ~2KB tail, which truncated 18 of 83
    // queries in round 8); the one printed line is the same query map at
    // trailing-zero-stripped 2-decimal precision — measured under the tail
    // budget — with failed/errors included only when non-empty.
    // Locale.ROOT: a comma-decimal default locale would print "1,23" and
    // make the JSON line unparseable — the formatted path must be as
    // locale-independent as the old v.toString one.
    def f2(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    val anyFailed = results.exists(_._3.isDefined) || stateTimes.exists(_._3.isDefined)
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath,
      (line(v => v.toString, stateDetail = true, failParts = true) + "\n").getBytes("UTF-8"))
    println(line(f2, stateDetail = false, failParts = anyFailed))
    graft.analytics.LlmOps.releaseCaches()
    spark.stop()
  }
}
