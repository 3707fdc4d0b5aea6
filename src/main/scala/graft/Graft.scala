package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: one call gives a SparkSession with every graft
  * surface active — the native function registry, the optimizer rule set
  * (via `graft.functions.GraftExtensions`), and the session defaults this
  * engine is designed around.
  *
  * {{{
  * val spark = Graft.session()                  // local development
  * val spark = Graft.configure(SparkSession.builder().master(...)).getOrCreate()
  * }}}
  *
  * On a real cluster, prefer `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` (picked up by every session including
  * thrift/connect servers); `configure` sets the same thing
  * programmatically.
  *
  * Defaults rationale (SURVEY.md §5):
  *  - AQE on with skew-join handling: the documented mitigation for hot
  *    LSH buckets / hot aggregation keys at scale.
  *  - `spark.sql.shuffle.partitions` is left to the caller/cluster EXCEPT
  *    in `session()`, which sizes it to the local core count — the 200
  *    default is wrong in both directions (too many for laptops, too few
  *    for 1000-executor clusters; size ≈ 2-3× total cores there).
  *  - UTC session timezone: deterministic timestamp semantics everywhere.
  */
object Graft {

  /** Apply graft configuration to any builder (cluster or local). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")

  /** A ready local session: extensions + functions registered, shuffle
    * width sized to the machine.
    *
    * getOrCreate IGNORES builder configs when a session already exists in
    * the JVM, so the defaults are re-applied to the returned session's
    * runtime conf (timezone/AQE/shuffle width are all runtime-settable) and
    * `register` patches in the functions + optimizer rule the static
    * `spark.sql.extensions` conf could no longer inject — the promised
    * semantics hold either way. */
  def session(master: String = "local[*]", appName: String = "graft"): SparkSession = {
    val cores = Runtime.getRuntime.availableProcessors()
    val s = configure(SparkSession.builder().master(master).appName(appName))
      .config("spark.sql.shuffle.partitions", cores.toString)
      .getOrCreate()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.shuffle.partitions", cores.toString)
    functions.GraftFunctions.register(s)
    s
  }
}
