package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.{AdcDot, CosineSimilarity, ExactDot, InRing, InRings, MinHash8, Q8Err, RepStats, SimHash16, Sq8Code}

/** Engine extension point (SparkSessionExtensions): registers the native
  * function surface so SQL users get the codegen'd hot paths.
  *
  * Wire up with `.withExtensions(new GraftExtensions)` (graft.Sessions
  * does this) or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      CosineSimilarity.info,
      CosineSimilarity.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_exact"),
      ExactDot.info,
      ExactDot.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_adc_dot"),
      AdcDot.info,
      AdcDot.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_sq8_code"),
      Sq8Code.info,
      Sq8Code.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_rep_stats"),
      RepStats.info,
      RepStats.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_q8_err"),
      Q8Err.info,
      Q8Err.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash16"),
      SimHash16.info,
      SimHash16.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash8"),
      MinHash8.info,
      MinHash8.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_in_ring"),
      InRing.info,
      InRing.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_in_rings"),
      InRings.info,
      InRings.builder))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
