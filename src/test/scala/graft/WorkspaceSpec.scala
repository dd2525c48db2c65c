package graft

import java.nio.file.{Files, Paths}

import graft.core.Workspace

/** The `graft.tmp` production-redirect path (Workspace.scala) is live
  * library surface — this pins it with a real materializing query
  * (VERDICT r4 #6): under an overridden root, every artifact ev08 writes
  * must land there, and the default root must not be touched.
  *
  * Safe to mutate `sys.props` here: `Test / fork := true` with the
  * default sequential forked-suite execution means no other suite runs
  * concurrently in this JVM, and the prior value is restored in finally.
  */
class WorkspaceSpec extends SparkSpec {

  test("root falls back to a derived path, never a hardcoded one") {
    val prior = sys.props.get("graft.tmp")
    try {
      sys.props.remove("graft.tmp")
      assert(Workspace.root == s"${sys.props("user.dir")}/target")
      sys.props("graft.tmp") = "/somewhere/else"
      assert(Workspace.root == "/somewhere/else")
      assert(Workspace.forInput("/data/sf0.1", "roundtrip") ==
        "/somewhere/else/roundtrip_data_sf0_1")
    } finally {
      prior match {
        case Some(v) => sys.props("graft.tmp") = v
        case None    => sys.props.remove("graft.tmp")
      }
    }
  }

  test("graft.tmp redirects ev08's artifacts; default root stays untouched") {
    val tmpRoot = Files.createTempDirectory("graft-tmp-spec").toString
    val prior = sys.props.get("graft.tmp")
    val sfx = sf0001.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_")
    val defSub = Paths.get(sys.props("user.dir"), "target",
      s"roundtrip_$sfx", "events_by_type")
    val before =
      if (Files.exists(defSub)) Some(Files.getLastModifiedTime(defSub))
      else None
    try {
      sys.props("graft.tmp") = tmpRoot
      val rows =
        SparkEntry.allDefs("ev08_partitioned_sink").fn(spark, sf0001).count()
      assert(rows > 0)
      val redirected = Paths.get(tmpRoot, s"roundtrip_$sfx", "events_by_type")
      assert(Files.exists(redirected),
        s"expected the partitioned sink under the override: $redirected")
      val after =
        if (Files.exists(defSub)) Some(Files.getLastModifiedTime(defSub))
        else None
      assert(after == before,
        "default scratch root was written during an overridden run")
    } finally {
      prior match {
        case Some(v) => sys.props("graft.tmp") = v
        case None    => sys.props.remove("graft.tmp")
      }
    }
  }
}
