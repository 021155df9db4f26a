package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as raw ns longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first job in a fresh JVM pays ~4-6 s of
    // classloading/codegen that would otherwise be billed to whichever
    // query sorts first (a10 absorbed it in rounds 2-4). One tiny scan
    // plus one tiny shuffle moves that cost out of every per-query
    // number.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    // (name, seconds, ok) — a failed query must NOT masquerade as a
    // fast timing (round-1 verdict "What's wrong" #4).
    // Materialize via the noop sink, NOT count(): under count() the
    // optimizer column-prunes the final projection, so projection-only
    // queries (f6_polar_stereo, llm_quality_score, ...) would be timed
    // as bare row-count scans with all their computed work elided.
    // The noop write evaluates every output column and discards rows.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // The harness keeps only a ~4 KB tail of this process's output, so the
    // JSON line must stay well under that or it is truncated mid-line and
    // unparseable (rounds 1-4 all recorded parsed:null). Millisecond
    // precision + listing only FAILED names keeps ~70 queries under ~2.5 KB.
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val failed = results.count(!_._3)
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$failed,"failed_names":$failedNames,"sf":"$sfDir"}""")
    spark.stop()
  }
}
