package graft.core

/** Workspace locations for queries that materialize intermediate
  * artifacts (round-trip sinks, bucketed warehouses, stream checkpoints):
  * every materializing query (ev05/ev07/ev08/ev14/…, dd09's index
  * warehouse, every stream checkpoint) routes through here, and
  * `WorkspaceSpec` pins the derivation. (Renamed from `Scratch` —
  * verdict r11: the old name invited deletion-by-mistake.)
  * One derivation — `graft.tmp` system property with a local fallback —
  * instead of a copy per query body: changing the scratch root is one
  * edit, and no query can silently write somewhere else. Local-filesystem
  * semantics are the contract here (the harness scratch); production
  * deployments point `graft.tmp` at a job-scoped path.
  */
object Workspace {
  /** `graft.tmp` when set; otherwise `<user.dir>/target` — derived, not a
    * hardcoded machine path, so a library consumer that hasn't set
    * `graft.tmp` writes under their own working directory (and in this
    * repo's harness that derivation lands on the same `target/` as
    * before). */
  def root: String = sys.props.getOrElse("graft.tmp",
    sys.props.get("user.dir").map(d => s"$d/target")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft"))
  def dir(sub: String): String = s"$root/$sub"

  /** Workspace dir keyed by a sanitized input-data dir. Queries that
    * materialize per-dataset artifacts (round-trip sinks, partitioned
    * rewrites) use this so interleaved or concurrent runs over different
    * fixtures never read each other's data — the dd09 index-naming
    * precedent, centralized. */
  def forInput(inputDir: String, sub: String): String = {
    val sfx = inputDir.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_")
    dir(s"${sub}_$sfx")
  }
}
