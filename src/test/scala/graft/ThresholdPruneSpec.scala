package graft

import org.apache.spark.sql.functions._

/** tx46 semantics: the broadcast-threshold variant of per-source quality
  * pruning. The oracle gate pins cross-engine parity on the real fixture;
  * the cases here pin the contracts the fixture can't reach — the exact
  * type-1 quantile against an independent in-memory computation, the
  * keep-ALL-boundary-ties semantics that distinguish it from tx29's
  * percent_rank form, and unscorable-document exclusion.
  */
class ThresholdPruneSpec extends SparkSpec {
  import spark.implicits._

  private def run(dir: String) =
    SparkEntry.allDefs("tx46_threshold_prune").fn(spark, dir)

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx46").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("int"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("threshold and kept mass match an independent in-memory quantile") {
    // real fixture data, independent re-derivation: per source, the
    // threshold must be the smallest q whose running count crosses
    // ceil(0.25*n), and the kept stats must be exactly the q >= t subset
    val scored = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(length(col("text")) > 0)
      .select(col("source"), graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toSeq
    val expected = scored.groupBy(_._1).map { case (src, rows) =>
      val qs = rows.map(_._2).sorted
      val n  = qs.size
      val need = math.ceil(0.25 * n).toLong
      val t = qs.zipWithIndex.collectFirst { case (q, i) if i + 1 >= need => q }.get
      val kept = qs.filter(_ >= t)
      val mass = kept.map(q => BigDecimal(q).setScale(6)).sum.toDouble
      src -> ((n.toLong, t, kept.size.toLong, mass))
    }
    val got = run(sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got === expected)
  }

  test("boundary ties are ALL kept — the broadcast-safe contract tx29 splits") {
    // qs sorted: [lo, lo, hi*6]; n=8, ceil(0.25*8)=2 -> running count at
    // lo is already 2, so t = lo and every doc survives. tx29's
    // percent_rank form would drop the two lo docs (pr 0/7, 1/7 < 0.25);
    // a value threshold cannot split equal scores, so it keeps them.
    val lo = "the aa"                                   // short, low lenScore
    val hi = "the " + Array.fill(50)("word").mkString(" ") // saturated lenScore
    val dir = writeDocs(
      (1L to 2L).map(i => (i, lo, "s")) ++ (3L to 8L).map(i => (i, hi, "s")))
    val Array(row) = run(dir).collect()
    assert(row.getLong(1) == 8L, "n_docs")
    assert(row.getLong(3) == 8L, s"all boundary ties kept, got ${row.getLong(3)}")
    // and the threshold is the tied LOW score, not the high one
    assert(row.getDouble(2) < 0.6, s"threshold ${row.getDouble(2)}")
  }

  test("unscorable docs (null/empty text) are excluded, not crashed on") {
    // length('')=0 makes punctRatio 0.0/0.0 — IEEE NaN in Spark but NULL
    // in DuckDB (verified), and the two order differently through
    // windows. The explicit length(text) > 0 guard must keep both the
    // NULL-text and empty-text rows out of histogram and keep set alike,
    // while scoreable docs in the same source still prune normally.
    val dir = writeDocs(Seq(
      (1L, null.asInstanceOf[String], "s"),
      (2L, "", "s"),
      (3L, "the aa bb", "s"),
      (4L, "the cc dd ee ff gg hh", "s"),
      (5L, "the " + Array.fill(50)("word").mkString(" "), "s")))
    val Array(row) = run(dir).collect()
    assert(row.getLong(1) == 3L, s"n_docs counts only scoreable docs: $row")
    assert(row.getLong(3) >= 1L && row.getLong(3) <= 3L)
  }

  test("st30 stream serving equals the batch kept set (train-offline parity)") {
    // the always-on admission filter must admit EXACTLY the docs the
    // batch threshold filter keeps — same thresholds, same guard, any
    // micro-batching
    val stream = SparkEntry.allDefs("st30_stream_threshold_prune").fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val scored = graft.queries.TextQueries.qualityScored(
      spark.read.parquet(s"$sf0001/documents.parquet"))
    val thr = graft.queries.TextQueries.qualityThresholds(scored)
      .select(col("source"), col("q_thresh"))
    val batch = scored.join(thr, Seq("source"))
      .where(col("q") >= col("q_thresh"))
      .select(col("doc_id"), col("source"), col("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(stream === batch && stream.nonEmpty)
  }

  test("partitioning-invariant: thresholds don't depend on data layout") {
    val base = run(sf0001).collect().toSeq
    val conf = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "7")
      assert(run(sf0001).collect().toSeq === base)
    } finally spark.conf.set(conf, old)
  }
}
