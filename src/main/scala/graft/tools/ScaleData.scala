package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the scaling-curve benchmark: replicates a
  * driver-generated fixture directory `factor`× into disjoint key spaces,
  * mirroring how the driver's own generator scales (fixed 30-day event
  * span, density and entity count grow with sf — verified sf0.01 → sf0.1:
  * 10× events/users/docs over the identical time range).
  *
  * Replication is NOT naive row copying — naive copies would create
  * cross-replica duplicate groups and turn every near-dup/blocking
  * operator quadratic in `factor` as a generator ARTIFACT (10 exact
  * copies of each doc ⟹ ~100× LSH candidate pairs), which would poison
  * the scaling measurement. Instead each replica is mapped into its own
  * similarity space:
  *
  *  - every join/entity key is offset by `replica · 10⁹` — the join graph
  *    becomes `factor` disjoint copies, so per-key cardinalities (orders
  *    per customer, lines per order) match the driver's generator;
  *  - `region`/`nation` stay fixed (TPC-H semantics: dimensions don't
  *    grow with sf), so nationkey references remain valid;
  *  - document TOKENS get a per-replica suffix (`tok` → `tok~3`), a
  *    bijective vocabulary rename: within-replica shingle/minhash/Jaccard
  *    structure is preserved exactly, cross-replica Jaccard drops to 0;
  *  - customer names get a per-replica `~ii` suffix (pairwise edit
  *    distance ≥ 2 between replicas), so edit-distance-1 entity
  *    resolution never pairs across replicas;
  *  - embeddings are circularly rotated by `replica` positions — an
  *    isometry (all within-replica cosines/distances exactly preserved)
  *    that decorrelates cross-replica similarity;
  *  - event timestamps are kept (fixed span, `factor`× density) and
  *    user ids are offset — the driver's own scaling shape. Same-time-
  *    bucket operators (co-purchase graphs) therefore densify
  *    quadratically, which is the workload's true semantics, not an
  *    artifact.
  *
  * Usage: `runMain graft.tools.ScaleData <baseDir> <outDir> [factor]`.
  * Output layout matches the fixture layout (`<outDir>/<table>.parquet`),
  * written as multi-file parquet so file-level parallelism at the scan
  * matches a production layout.
  */
object ScaleData {
  /** Key stride between replicas — far above any base-fixture key. */
  val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleData <baseDir> <outDir> [factor]")
    val spark = graft.core.GraftSession
      .builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1), if (args.length > 2) args(2).toInt else 10)
    spark.stop()
  }

  def run(spark: SparkSession, base: String, out: String, factor: Int): Unit = {

    val rep = col("replica")
    val off = rep.cast("long") * Stride
    def keyed(keys: String*): Seq[(String, Column => Column)] =
      keys.map(k => k -> ((c: Column) => c + off))

    // cross-join each base table with replica ids 0..factor-1, then apply
    // per-column transforms; replica 0 is the identity (offset 0, empty
    // suffix, rotation 0), so the base fixture embeds unchanged
    def scale(table: String, mods: Seq[(String, Column => Column)],
        extra: DataFrame => DataFrame = identity): Unit = {
      val baseDf = spark.read.parquet(s"$base/$table.parquet")
      val replicas = spark.range(factor).select(col("id").cast("int").as("replica"))
      var df = baseDf.crossJoin(broadcast(replicas))
      for ((name, f) <- mods) df = df.withColumn(name, f(col(name)))
      // the base fixture is a single file, so the crossJoin inherits ONE
      // partition — write a multi-file layout or every downstream scan of
      // the scaled fixture is a single split and map-heavy stages run on
      // one core (the first sf1 run measured dd03 at 174× from exactly this)
      extra(df).drop("replica")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
    }

    def copy(table: String): Unit =
      spark.read.parquet(s"$base/$table.parquet")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")

    // suffix that keeps replicas ≥ 2 edits apart (and ≥ 3 from replica 0)
    val nameSfx = when(rep === 0, lit(""))
      .otherwise(concat(lit("~"), rep.cast("string"), rep.cast("string")))

    copy("region")
    copy("nation")
    scale("customer", keyed("c_custkey") :+
      ("c_name" -> ((c: Column) => concat(c, nameSfx))))
    scale("supplier", keyed("s_suppkey"))
    scale("part", keyed("p_partkey"))
    scale("orders", keyed("o_orderkey", "o_custkey"))
    scale("lineitem", keyed("l_orderkey", "l_partkey", "l_suppkey"))
    scale("events", keyed("event_id", "user_id"))
    // bijective per-replica vocabulary rename; n_chars re-derived so the
    // stats queries stay consistent with the transformed text
    scale("documents",
      Seq("doc_id" -> ((c: Column) => c + off),
        "text" -> ((c: Column) =>
          when(rep === 0, c).otherwise(regexp_replace(c, lit("(\\S+)"),
            concat(lit("$1~"), rep.cast("string")))))),
      df => df.withColumn("n_chars", length(col("text")).cast("long")))
    // circular rotation = isometry within a replica, decorrelated across
    // rotation amount mod dims: at factor > dims the raw replica id
    // exceeded the vector length and slice() threw on a negative length
    // (caught by the first sf10 = factor-100 generation). Rotation alone
    // COLLIDES past dims replicas (r ≡ r' mod dims ⟹ identical vector
    // sets ⟹ exact cross-replica cosine twins — the similarity-space
    // artifact this generator exists to avoid), so each dims-block also
    // flips the global sign: negation is an isometry (within-replica
    // cosines exact) and cross-block twins become anti-twins (cos −1,
    // never near-dups). Unique isometry per replica up to 2·dims = 128.
    scale("embeddings",
      Seq("vec_id" -> ((c: Column) => c + off),
        "embedding" -> ((c: Column) => {
          val r = pmod(rep, size(c))
          val rotated = when(r === 0, c).otherwise(concat(
            slice(c, r + 1, size(c) - r), slice(c, lit(1), r)))
          // block parity without a float division: (rep div dims) is odd
          // ⟺ rep − (rep mod dims) ≡ dims (mod 2·dims)
          val odd = pmod(rep.cast("long") - r.cast("long"),
            size(c).cast("long") * 2) === size(c).cast("long")
          when(odd, transform(rotated, v => -v)).otherwise(rotated)
        })))

    println(s"""{"scaled":"$base","to":"$out","factor":$factor}""")
  }
}
