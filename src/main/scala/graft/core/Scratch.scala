package graft.core

/** Scratch-space locations for queries that materialize intermediate
  * artifacts (round-trip sinks, bucketed warehouses, stream checkpoints).
  * One derivation — `graft.tmp` system property with a local fallback —
  * instead of a copy per query body: changing the scratch root is one
  * edit, and no query can silently write somewhere else. Local-filesystem
  * semantics are the contract here (the harness scratch); production
  * deployments point `graft.tmp` at a job-scoped path.
  */
object Scratch {
  def root: String = sys.props.getOrElse("graft.tmp", "/root/repo/target")
  def dir(sub: String): String = s"$root/$sub"
}
