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
      assert(filesUnder(dir).nonEmpty,
        "k-core rounds must checkpoint reliably under the conf")
      r
    }
    assert(reliable == local)
  }
}
