package graft

import org.apache.spark.sql.SparkSession

/** Session-level performance configuration shared by the runtime
  * surfaces (Bench / Verify / Smoke / PlanDump).
  *
  * Two layers:
  *  1. [[defaults]] — measured, scale-justified settings (each one is
  *     A/B'd in OPTIMIZATION_r17.md; none changes any query's result,
  *     only the physical plan / evaluation cost).
  *  2. `SPARK_GRAFT_EXTRA_CONF` — `k=v;k=v` overrides for experiments
  *     and for production deployments whose cluster shape differs from
  *     the local default (the round rules ask for scale-dependent
  *     settings to stay parameterised rather than hard-coded).
  */
object SessionTuning {

  /** Measured defaults. Rationale (details in OPTIMIZATION_r17.md):
    *
    *  - `excludedRules = InferFiltersFromGenerate`: every explode in
    *    this engine feeds a COMPUTED array (tokenize→shingle chains,
    *    band keys, gram streams) — never a stored array column. The
    *    rule infers `size(arr) > 0 AND isnotnull(arr)` on the
    *    generator input; predicate pushdown then substitutes the
    *    aliased expression into the filter below the defining
    *    projection, so the regex-heavy tokenize+shingle tree is
    *    evaluated up to two extra times per row at the scan (visible
    *    in plans/r17/dedup_minhash_lsh_before.txt operator (4)). The
    *    inferred filter removes no rows a non-outer Generate would
    *    not already drop; excluding the rule is a pure evaluation-
    *    count win at any scale.
    */
  val defaults: Map[String, String] = Map(
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")

  /** `SPARK_GRAFT_EXTRA_CONF="a=b;c=d"` → Map(a -> b, c -> d). */
  def extra(): Map[String, String] =
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(';').toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_EXTRA_CONF entry not k=v: '$kv'")
        kv.substring(0, i).trim -> kv.substring(i + 1).trim
      }.toMap).getOrElse(Map.empty)

  /** All tuning confs, extras overriding defaults. */
  def all(): Map[String, String] = defaults ++ extra()

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    all().foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
