package graft.bench

import org.apache.spark.sql.functions._

/** Attribution harness for dd12 (FastSS fuzzy name join) — round-7
  * verdict #8: its sf0.1→sf1 curve is 5.0× for 10× rows, the steepest
  * non-graph row in SCALING.md. Decides WHICH stage grows superlinearly:
  *
  *  - candidate volume: the variant equi-join's output rows (every
  *    colliding (a, b) pair before the levenshtein verify). FastSS block
  *    sizes scale with the DENSITY of the name space — TPC-H names are
  *    "Customer#<9 digits>", so 10× rows makes every numeric deletion
  *    variant ~10× more populated and candidates grow ~quadratically in
  *    density;
  *  - verify cost: levenshtein + distinct over those candidates (linear
  *    in candidates).
  *
  * Prints, per SF dir argument: rows, distinct variants, candidate
  * pairs, true pairs, and the timed split (join-only vs full query).
  */
object Dd12Profile {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      System.gc(); val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (dir <- dirs) {
      val cust = graft.core.Tables(spark, dir).customer
        .select(col("c_custkey").as("id"), col("c_name").as("s"))
      val n = cust.count()
      val variants = cust
        .select(col("id"), col("s"),
          explode(graft.operators.FuzzyJoin.deletionVariants(col("s"))).as("v0"))
        .select(col("id"), col("s"), xxhash64(col("v0")).as("v"))
      val nVariants = variants.count()
      val candidates = variants.as("a").join(variants.as("b"),
          col("a.v") === col("b.v") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.s").as("sa"), col("b.s").as("sb"))
      val tJoin = time {
        candidates.write.format("noop").mode("overwrite").save()
      }
      val nCand = candidates.count()
      val full = graft.SparkEntry.allDefs("dd12_fuzzy_name_join")
      val tFull = time { full.fn(spark, dir).write.format("noop").mode("overwrite").save() }
      val nTrue = full.fn(spark, dir).count()
      println(f"[dd12profile] $dir: rows=$n variants=$nVariants candidates=$nCand " +
        f"true_pairs=$nTrue join_only=$tJoin%.2f s full=$tFull%.2f s " +
        f"verify_share=${(tFull - tJoin) / tFull * 100}%.0f%%")
      // A/B: the pre-rewrite verify shape (levenshtein in Filter AND
      // Project — two evaluations per raw candidate — then distinct)
      // vs the shipped distinct-then-verify shape, median of 3
      val oldDf = candidates
        .where(levenshtein(col("sa"), col("sb")) <= 1)
        .select(col("id_a"), col("id_b"), col("sa").as("name_a"),
          col("sb").as("name_b"), levenshtein(col("sa"), col("sb")).as("d"))
        .distinct()
      def med3(f: => Unit): Double = {
        time(f); Seq.fill(3)(time(f)).sorted.apply(1)
      }
      val tOld = med3(oldDf.write.format("noop").mode("overwrite").save())
      val tNew = med3(full.fn(spark, dir).write.format("noop").mode("overwrite").save())
      println(f"[dd12profile] $dir: verify A/B old=$tOld%.2f s new=$tNew%.2f s")
    }
    spark.stop()
  }
}
