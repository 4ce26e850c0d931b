package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). Column
  * selection happens downstream — Spark's parquet reader prunes to the
  * required schema automatically, so scans only read referenced columns. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Parquet row count read from FILE FOOTERS — no Spark job, no scan.
    * This is the sizing primitive for every data-derived capacity (bloom
    * bits, quantizer cell counts, LSH plane counts, bucket counts): a query
    * builder may call it at frame-construction time without scheduling
    * work, so plan-shape audits that never execute the frame stay job-free.
    * Handles both a single parquet file and a directory of part files.
    * Memoized on (path, latest mtime, total length), so a rewritten dir
    * (GenData regeneration in the same JVM) is re-read, not served stale. */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    val files = {
      val st = fs.getFileStatus(root)
      if (st.isDirectory)
        fs.listStatus(root).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      else Seq(st)
    }
    val key = (root.toString,
      files.map(_.getModificationTime).maxOption.getOrElse(0L),
      files.map(_.getLen).sum)
    rowCountMemo.getOrElseUpdate(key, files.map { s =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(s, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum)
  }
  private val rowCountMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long), Long]

  /** Short stable tag of a data directory, safe inside a table identifier —
    * used to key materialized state tables (bucketed facts, fingerprint
    * state) by the dir they were built from, so two dirs in one warehouse
    * never clobber each other's layout. */
  def dirTag(sfDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  }

  /** Register every table as a temp view so the whole surface is reachable
    * from `spark.sql(...)` (plus `js_num` via GraftFunctions/extensions).
    * Idempotent per (session, dir): re-registration would re-read ten
    * parquet schemas on every SQL-surface query. `force = true` re-registers
    * unconditionally — harnesses that rewrite the parquet under an already-
    * registered dir mid-session use it to avoid serving stale views. */
  def registerViews(spark: SparkSession, sfDir: String, force: Boolean = false): Unit = {
    val marker = "graft.views.dir"
    if (force || !spark.conf.getOption(marker).contains(sfDir)) {
      // events goes through the normalizing loader so the SQL surface sees
      // the same epoch-nanos `ts` contract as the DataFrame surface
      names.foreach { n =>
        val df = if (n == "events") events(spark, sfDir) else apply(spark, sfDir, n)
        df.createOrReplaceTempView(n)
      }
      spark.conf.set(marker, sfDir)
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** Events with `ts` normalized to epoch-nanos LongType regardless of the
    * physical parquet layout. The driver's testdata has shipped `ts` two
    * ways across rounds: INT64 TIMESTAMP(NANOS) (arrives as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
    * (arrives as TimestampType/TimestampNTZType). Every downstream query
    * and every DuckDB oracle (`epoch_ns(ts)` — UTC-anchored for naive
    * timestamps) is written against the epoch-nanos contract, so the
    * conversion happens HERE, once: `unix_micros * 1000` under the pinned
    * UTC session timezone is bit-identical to DuckDB's `epoch_ns`. The
    * branch is a schema check — no job, no data pass beyond the projection
    * Catalyst folds into the scan it already runs. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case tsType @ (TimestampType | TimestampNTZType) =>
        // Only the NTZ layout depends on the session zone: the cast
        // re-interprets the naive value in the SESSION timezone, so its
        // epochs are bit-identical to DuckDB's epoch_ns only under UTC —
        // fail loudly for a shifted zone. The zoned TimestampType branch
        // is already an instant; unix_micros on it is session-zone-
        // independent, so non-UTC callers on that path stay correct and
        // must NOT be failed (they previously worked).
        // accept any zero-offset zone spelling ("UTC", "Etc/UTC", "GMT",
        // "+00:00" all normalize to ZoneOffset.UTC) — only a genuinely
        // shifted zone is an error
        if (tsType == TimestampNTZType) {
          val tz = s.conf.get("spark.sql.session.timeZone")
          val utc = try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
            catch { case _: Throwable => false }
          require(utc,
            s"events.ts (TIMESTAMP_NTZ) normalization requires a UTC session timezone " +
              s"(got '$tz'): naive-timestamp epochs would shift by the zone offset")
        }
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * 1000L"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
