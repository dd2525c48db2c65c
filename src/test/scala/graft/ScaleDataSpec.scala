package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the invariants [[graft.tools.ScaleData]]'s scaling-curve fixtures
  * rely on. The whole point of the tool is that a `factor`× corpus does
  * `factor`× work — these assertions are what make the sf0.1 → sf1 curve
  * in SCALING.md a measurement instead of a generator artifact:
  *
  *  - keys are offset into disjoint ranges and the join graph stays
  *    intact (no orphaned foreign keys);
  *  - replica vocabularies are disjoint, so near-dup candidate volume
  *    grows linearly (cross-replica Jaccard/minhash collisions would
  *    grow it quadratically);
  *  - customer names across replicas stay ≥ 2 edits apart, so
  *    edit-distance-1 entity resolution never pairs across replicas;
  *  - embedding rotation is an isometry: within-replica norms and
  *    pairwise dot products are bit-preserved (floats are permuted, not
  *    recomputed), cross-replica vectors are genuinely different.
  */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = {
    val dir = Files.createTempDirectory("scaledata-spec").toString
    graft.tools.ScaleData.run(spark, sf0001, dir, 3)
    dir
  }
  private val stride = graft.tools.ScaleData.Stride

  test("keys land in disjoint replica ranges with the join graph intact") {
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    assert(li.count() == 3 * spark.read.parquet(s"$sf0001/lineitem.parquet").count())
    // every lineitem joins an order in the SAME replica (offsets consistent)
    val orphans = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
    assert(orphans.count() == 0)
    val ranges = li.select((col("l_orderkey") / stride).cast("int").as("r"))
      .distinct().as[Int].collect().sorted
    assert(ranges.toSeq == Seq(0, 1, 2))
    // fixed dimensions are NOT replicated
    assert(spark.read.parquet(s"$out/nation.parquet").count() ==
      spark.read.parquet(s"$sf0001/nation.parquet").count())
  }

  test("replica vocabularies are disjoint; names stay >= 2 edits apart") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val vocab = docs
      .select((col("doc_id") / stride).cast("int").as("r"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0).distinct()
    val cross = vocab.as("a").join(vocab.as("b"),
      $"a.tok" === $"b.tok" && $"a.r" =!= $"b.r")
    assert(cross.count() == 0, "a token appears in two replicas")
    // n_chars re-derived over the transformed text
    assert(docs.where(length(col("text")) =!= col("n_chars")).count() == 0)
    val names = spark.read.parquet(s"$out/customer.parquet")
      .select((col("c_custkey") / stride).cast("int").as("r"),
        (col("c_custkey") % stride).as("k"), col("c_name"))
    val pairs = names.as("a").join(names.as("b"),
        $"a.k" === $"b.k" && $"a.r" < $"b.r")
      .select(levenshtein($"a.c_name", $"b.c_name").as("d"))
    assert(pairs.where(col("d") < 2).count() == 0,
      "cross-replica copies of a name within edit distance 1")
  }

  test("embedding rotation is a within-replica isometry") {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
      .select((col("vec_id") / stride).cast("int").as("r"),
        (col("vec_id") % stride).as("k"), col("embedding"))
    // a rotation permutes components without arithmetic: the sorted
    // component multiset is bit-identical (⟹ norms/dot structure
    // preserved under the common permutation), yet the vector differs
    val base = emb.where(col("r") === 0).select(col("k"), col("embedding").as("e0"))
    val rot = emb.where(col("r") === 1).select(col("k"), col("embedding").as("e1"))
    val both = base.join(rot, "k")
      .select((array_sort(col("e0")) === array_sort(col("e1"))).as("perm"),
        (col("e0") === col("e1")).as("same"))
    assert(both.where(!col("perm")).count() == 0, "components changed")
    assert(both.where(col("same")).count() == 0, "rotation was a no-op")
  }

  test("factor above dims: rotation collisions are sign-flipped, never exact twins") {
    // at factor > dims the rotation amount wraps (r ≡ r mod dims); the
    // generator must not hand ann08-class queries exact cross-replica
    // cosine twins (round-12: the first factor-100 build did, and before
    // that slice() threw on the negative length)
    val dir = Files.createTempDirectory("scaledata-spec-f100").toString
    graft.tools.ScaleData.run(spark, sf0001, dir, 66)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select((col("vec_id") / stride).cast("int").as("r"),
        (col("vec_id") % stride).as("k"), col("embedding"))
    val dims = emb.select(size(col("embedding"))).as[Int].head()
    assert(dims < 66, s"fixture dims $dims >= factor 66: no wrap to test")
    val base = emb.where(col("r") === 0).select(col("k"), col("embedding").as("e0"))
    val wrap = emb.where(col("r") === dims)
      .select(col("k"), col("embedding").as("ew"))
    val both = base.join(wrap, "k")
      .select((col("ew") === col("e0")).as("twin"),
        (col("ew") === transform(col("e0"), v => -v)).as("negated"))
    assert(both.where(col("twin")).count() == 0,
      "factor-wrap produced exact cross-replica twins")
    assert(both.where(!col("negated")).count() == 0,
      "wrapped replica must be the exact global negation (an isometry)")
  }
}
