package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.core.{Tables, TsAdapt}

/** Fixture-schema canary (VERDICT r6 #2).
  *
  * Round 6 lost 46 judged queries, 9 tests and 7 bench rows to a single
  * silent driver-side fixture regeneration: `events.parquet` switched from
  * TIMESTAMP(NANOS) (read as BIGINT nanos) to TIMESTAMP_MICROS-NTZ and the
  * engine's hard-coded `ts div 1000` failed analysis on every events
  * reader. This spec turns the next such drift into one targeted test
  * name:
  *
  *   - every `Tables.*` accessor must materialize a row from the real
  *     fixture dir (catches any table's schema/type drift at `sbt test`
  *     time, not judge time);
  *   - the events time column must normalize to TimestampType on BOTH
  *     layouts the driver has shipped (the other layout is synthesized
  *     in-test), and on the already-normalized layout, so a future
  *     regeneration in either direction keeps working.
  */
class FixtureCanarySpec extends SparkSpec {

  test("canary: every fixture table materializes one row via Tables") {
    val t = Tables(spark, sf0001)
    val accessors: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
    val failures = accessors.flatMap { case (name, df) =>
      try { df.limit(1).collect(); None }
      catch { case e: Exception =>
        val first = Option(e.getMessage)
          .flatMap(_.linesIterator.find(_.nonEmpty))
          .getOrElse(e.getClass.getSimpleName)
        Some(s"$name: $first") }
    }
    assert(failures.isEmpty,
      s"fixture drift — Tables accessor(s) no longer read: $failures")
  }

  test("canary: events ts arrives as TimestampType whatever the layout") {
    val ts = Tables(spark, sf0001).events.schema("ts").dataType
    assert(ts == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got $ts")
  }

  test("TsAdapt handles all three ts layouts identically") {
    import spark.implicits._
    // One known instant: 2024-03-01T12:00:00Z = 1709294400s epoch.
    val micros = 1709294400L * 1000000L
    val nanosDf = Seq((micros * 1000L, "a")).toDF("ts", "v") // BIGINT nanos
    val ntzDf = spark.sql(
      s"SELECT timestamp_ntz '2024-03-01 12:00:00' AS ts, 'a' AS v")
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
    val ltzDf = spark.sql(
      s"SELECT timestamp '2024-03-01 12:00:00' AS ts, 'a' AS v")
    assert(nanosDf.schema("ts").dataType == LongType)

    val out = Seq(nanosDf, ntzDf, ltzDf).map { df =>
      val r = TsAdapt.toTimestamp(df, "ts")
      assert(r.schema("ts").dataType == TimestampType)
      r.select(unix_timestamp(col("ts"))).as[Long].head()
    }
    assert(out.toSet == Set(1709294400L),
      s"layouts disagree on the instant: $out")
  }

  test("canary: engine-required columns exist with usable types") {
    // Materializing a row catches hard breaks; this catches the quieter
    // drift — a renamed/retyped column that analysis would only reject
    // query-by-query. One assertion per (table, column) the engine's
    // operators actually reference.
    val t = Tables(spark, sf0001)
    val required: Seq[(String, org.apache.spark.sql.DataFrame, Seq[String])] = Seq(
      ("events", t.events,
        Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
      ("documents", t.documents,
        Seq("doc_id", "text", "lang", "source", "n_chars")),
      ("embeddings", t.embeddings, Seq("vec_id", "embedding", "label")),
      ("lineitem", t.lineitem,
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")),
      ("orders", t.orders,
        Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")))
    val missing = required.flatMap { case (name, df, cols) =>
      val have = df.columns.toSet
      cols.filterNot(have).map(c => s"$name.$c")
    }
    assert(missing.isEmpty, s"fixture drift — missing columns: $missing")
  }

  test("canary: filtered value domains still exist in the fixture") {
    // Queries that filter on literal labels (ev32/st-family on
    // event_type, funnels on click/view/signup) would not CRASH if the
    // driver relabeled a domain — they'd emit zero rows and the oracle
    // would agree on empty, a silently-weakened gate. Pin the domains.
    val t = Tables(spark, sf0001)
    val types = t.events.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    val needed = Set("click", "view", "signup", "purchase", "error")
    assert(needed.subsetOf(types),
      s"event_type domain drifted: missing ${needed -- types}")
    // tx18/tx23 stratify on these; an empty stratum flips their caps
    assert(t.documents.select("lang").distinct().count() >= 2,
      "documents.lang collapsed to one stratum")
    assert(t.documents.select("source").distinct().count() >= 2,
      "documents.source collapsed to one stratum")
    // gr07/gr08's LPA arg-max breaks ties via max(struct(cnt, -label)),
    // which is only a correct min-label order for NON-NEGATIVE ids
    // (Graph.labelPropagation documents the contract); a signed user_id
    // domain would silently flip tie-breaks rather than crash
    import org.apache.spark.sql.functions.min
    assert(t.events.agg(min("user_id")).head().getLong(0) >= 0L,
      "user_id went negative: gr07's -label tie-break contract broken")
  }

  test("canary: embeddings vectors survive both float and double layouts") {
    // The driver ships list<float>; every vector operator casts to
    // array<double> at entry. If a regeneration flips the element type,
    // the cast must stay a no-op-or-widen, never an analysis error.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-canary-emb").toFile
    dir.deleteOnExit()
    for ((tag, cast) <- Seq("f" -> "array<float>", "d" -> "array<double>")) {
      val p = s"${dir.getAbsolutePath}/$tag.parquet"
      Seq((1L, Seq(3.0, 4.0)), (2L, Seq(4.0, 3.0)))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(cast).as("embedding"))
        .write.mode("overwrite").parquet(p)
      val emb = spark.read.parquet(p)
      val topk = graft.operators.Similarity
        .bruteForceTopK(emb.where(col("vec_id") === 1L), emb, k = 1)
        .select($"neighbor_id", $"cos").as[(Long, Double)].head()
      assert(topk._1 == 2L)
      assert(math.abs(topk._2 - 24.0 / 25.0) < 1e-6, s"layout $tag: $topk")
    }
  }

  test("TsAdapt round-trips both parquet layouts the driver has shipped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-canary").toFile
    dir.deleteOnExit()
    val micros = 1709294400L * 1000000L

    // Layout A (rounds 1-5): BIGINT column — what nanosAsLong yields for
    // TIMESTAMP(NANOS) physical storage.
    val aPath = s"${dir.getAbsolutePath}/a.parquet"
    Seq((micros * 1000L + 999L, 1L)).toDF("ts", "id") // +999ns: floor check
      .write.mode("overwrite").parquet(aPath)

    // Layout B (round 6 regeneration): TIMESTAMP_MICROS isAdjustedToUTC=0
    // → TIMESTAMP_NTZ on read.
    val bPath = s"${dir.getAbsolutePath}/b.parquet"
    spark.sql("SELECT timestamp_ntz '2024-03-01 12:00:00' AS ts, 1L AS id")
      .write.mode("overwrite").parquet(bPath)

    val instants = Seq(aPath, bPath).map { p =>
      val df = TsAdapt.toTimestamp(spark.read.parquet(p), "ts")
      assert(df.schema("ts").dataType == TimestampType)
      df.select(unix_timestamp(col("ts"))).as[Long].head()
    }
    assert(instants.toSet == Set(1709294400L),
      s"parquet layouts disagree on the instant: $instants")
  }
}
