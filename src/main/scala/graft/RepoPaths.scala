package graft

/** Checkout-relative path resolution. The oracle-dump paths
  * (warehouse tables, k-means centroids) must be absolute — the oracle
  * SQL is a static string the driver's DuckDB executes with no
  * templating — but hardcoding `/root/repo` breaks any other checkout.
  * Resolve from `-Dgraft.repo.root=...` when given, else `user.dir`
  * (sbt forks run/test JVMs with user.dir = the build base directory).
  */
object RepoPaths {
  val root: String =
    new java.io.File(sys.props.getOrElse("graft.repo.root", sys.props("user.dir")))
      .getAbsolutePath

  /** `target/<rel>` under the checkout — cleared by `sbt clean`,
    * never outside the repo.
    */
  def target(rel: String): String = s"$root/target/$rel"
}
