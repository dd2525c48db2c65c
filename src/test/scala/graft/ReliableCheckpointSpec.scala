package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The reliable-checkpoint path (`spark.graft.checkpoint.dir`) — the
  * cluster-side half of the iterative operators' lineage cuts. Local
  * mode runs on executor-memory `localCheckpoint` blocks, which are LOST
  * on executor failure; a 1000-executor job sets the conf and every
  * round becomes a durable `checkpoint()` instead. This spec proves that
  * half actually engages: checkpoint files appear under the dir, and the
  * results are bit-identical to the localCheckpoint path, for BOTH
  * dispatch sites — `Dedup.ckpt` (dd07's star-contraction) and
  * `Graph.snapshot` (gr06's k-core peeling).
  */
class ReliableCheckpointSpec extends SparkSpec {

  private def filesUnder(root: Path): Seq[Path] =
    if (!Files.exists(root)) Seq.empty
    else Files.walk(root).iterator.asScala.filter(Files.isRegularFile(_)).toSeq

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).toSeq.sorted

  private def withCheckpointDir[A](f: Path => A): A = {
    val dir = Files.createTempDirectory("graft-ckpt")
    // the context remembers the previous UUID-suffixed dir; clear so the
    // substring guard in ckpt/snapshot re-points it at OUR dir
    spark.conf.set("spark.graft.checkpoint.dir", dir.toString)
    spark.sparkContext.setCheckpointDir(dir.toString)
    try f(dir)
    finally {
      spark.conf.unset("spark.graft.checkpoint.dir")
      filesUnder(dir) // leave files for inspection on failure; tmpfs clears
    }
  }

  test("dd07 star-contraction writes reliable checkpoints and matches localCheckpoint") {
    val local = rows("dd07_dup_clusters")
    val reliable = withCheckpointDir { dir =>
      val r = rows("dd07_dup_clusters")
      assert(filesUnder(dir).nonEmpty,
        "reliable checkpoint files must appear under spark.graft.checkpoint.dir")
      r
    }
    assert(reliable == local)
  }

  test("gr06 k-core peeling writes reliable checkpoints and matches localCheckpoint") {
    val local = rows("gr06_kcore")
    val reliable = withCheckpointDir { dir =>
      val r = rows("gr06_kcore")
      // rdd-N DIRECTORIES, not regular files: gr06's 3-core is EMPTY at
      // sf0.001, so the final surviving snapshot is a 0-partition RDD whose
      // checkpoint dir holds no part files — and now that superseded rounds
      // are deleted as they land (advisor r9), that empty dir is the only
      // durable evidence left on disk
      assert(rddDirs(dir).nonEmpty,
        "k-core rounds must checkpoint reliably under the conf")
      r
    }
    assert(reliable == local)
  }

  /** Checkpoint payload directories (`rdd-N`) under the configured dir's
    * UUID subdirectory — one per durable snapshot still on disk.
    */
  private def rddDirs(root: Path): Seq[String] =
    if (!Files.exists(root)) Seq.empty
    else Files.walk(root).iterator.asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("rdd-"))
      .map(_.getFileName.toString).toSeq

  test("kCore reliable rounds delete superseded checkpoints, keeping only the live one") {
    import spark.implicits._
    withCheckpointDir { dir =>
      // 5-clique (core) + a 6–7 tail that takes two peel rounds to erode,
      // so the loop writes several durable snapshots (edges + degrees per
      // round) before converging
      val cliq = for { a <- 1L to 5L; b <- 1L to 5L if a != b } yield (a, b)
      val tail = Seq((5L, 6L), (6L, 5L), (6L, 7L), (7L, 6L))
      val edges = (cliq ++ tail).toDF("src", "dst")
      graft.operators.Graph.kCore(spark, edges, k = 3, rounds = 8).collect()
      val live = rddDirs(dir)
      assert(live.size <= 2,
        s"superseded round checkpoints must be deleted as rounds land, found: $live")
      graft.operators.Graph.releaseCaches()
      assert(rddDirs(dir).isEmpty,
        "releaseCaches must drop the final snapshot's durable files too")
    }
  }

  test("ckpt's reliable branch bounds durable dirs to the ring size") {
    // advisor finding r10: df.checkpoint() leaves its rdd-N dir on disk
    // forever, so a long session with the conf set leaked one dir per
    // ckpt() call (tx40 alone writes ~19 per invocation). The 64-slot
    // ring must delete superseded dirs as slots recycle — after 70
    // checkpoints at most 64 of them may remain on disk.
    import spark.implicits._
    withCheckpointDir { dir =>
      (1 to 70).foreach { i =>
        graft.operators.Dedup.ckpt(Seq((i.toLong, i * 2L)).toDF("a", "b"))
      }
      val live = rddDirs(dir).size
      assert(live <= 64, s"ring must bound durable checkpoint dirs, found $live")
      assert(live >= 50, s"recent checkpoints must survive, found $live")
    }
  }

  test("checkpoint-dir guard re-points when the configured dir changes (prefix case)") {
    // the advisor's scenario: the context currently checkpoints under
    // .../ckpt2 and the conf switches to .../ckpt — a raw substring guard
    // matches (".../ckpt" ⊂ ".../ckpt2/UUID") and silently keeps writing
    // to the stale dir; the parent-compare guard must re-point
    val base = Files.createTempDirectory("graft-repoint")
    val oldDir = base.resolve("ckpt2")
    val newDir = base.resolve("ckpt")
    try {
      spark.conf.set("spark.graft.checkpoint.dir", oldDir.toString)
      assert(graft.operators.Dedup.reliableCheckpointing(spark))
      val pointedOld = spark.sparkContext.getCheckpointDir.get
      assert(pointedOld.contains("ckpt2"))
      spark.conf.set("spark.graft.checkpoint.dir", newDir.toString)
      assert(graft.operators.Dedup.reliableCheckpointing(spark))
      val pointedNew = spark.sparkContext.getCheckpointDir.get
      assert(pointedNew.contains("/ckpt/") || pointedNew.endsWith("/ckpt"),
        s"guard must re-point to the new dir, still at: $pointedNew")
      // and idempotence: a second call with the same conf must NOT mint a
      // fresh UUID dir (the failure the guard originally existed to stop)
      assert(graft.operators.Dedup.reliableCheckpointing(spark))
      assert(spark.sparkContext.getCheckpointDir.get == pointedNew)
    } finally spark.conf.unset("spark.graft.checkpoint.dir")
  }

  test("tx40 GD training writes reliable checkpoints and matches localCheckpoint") {
    // the third Dedup.ckpt consumer with a multi-round loop: under the
    // conf every per-round weight cut (and the feature matrix) becomes a
    // durable checkpoint() — eager, so the 16-round fold runs at plan
    // build; results must still be bit-identical to the local path
    val local = rows("tx40_quality_classifier")
    val reliable = withCheckpointDir { dir =>
      val r = rows("tx40_quality_classifier")
      assert(filesUnder(dir).nonEmpty,
        "GD rounds must checkpoint reliably under the conf")
      r
    }
    assert(reliable == local)
  }
}
