package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Optional extra
  * args name a subset of queries to (re-)dump — builder iteration only;
  * the driver's two-arg invocation always dumps everything. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    // A misspelled subset name would silently dump nothing and exit 0 —
    // which reads as a green re-verify of that query. Fail loudly instead.
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    // GRAFT_CTHIN_FORCE / GRAFT_FULL_PAIRS swap in audit-mode plans whose
    // results legitimately differ from the default plans the DuckDB oracle
    // mirrors above the sampling rungs — a Verify dump taken with either
    // set would be silently compared against the WRONG oracle and report a
    // spurious mismatch (or, worse, a spurious pass). Audit runs go through
    // Probe / dedicated specs, never through the oracle gate; fail fast
    // here unless the operator explicitly acknowledges with GRAFT_AUDIT=1.
    val auditFlags = Seq("GRAFT_CTHIN_FORCE", "GRAFT_FULL_PAIRS")
      .filter(k => sys.env.contains(k) || sys.props.contains(k))
    require(auditFlags.isEmpty ||
      sys.env.get("GRAFT_AUDIT").orElse(sys.props.get("GRAFT_AUDIT")).contains("1"),
      s"${auditFlags.mkString(", ")} set: audit-mode plans do not match the " +
        "DuckDB oracle above the sampling rungs, so this dump would gate " +
        "against the wrong mirror. Unset the flag(s), or set GRAFT_AUDIT=1 " +
        "to dump anyway (audit use only — do NOT run the oracle compare).")
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
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.analytics.LlmOps.releaseCaches()
    spark.stop()
  }
}
