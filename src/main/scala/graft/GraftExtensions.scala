package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's native and
  * composite expressions as SQL functions so they're reachable from
  * spark.sql(...) and ANSI SQL pipelines, not just the Column API. The
  * function list lives in org.apache.spark.sql.graft.GraftFunctions and is
  * shared with the running-session registration path.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions  // config-driven
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    org.apache.spark.sql.graft.GraftFunctions.functions.foreach(ext.injectFunction)
    // O(d·n) banded rewrite for levenshtein-threshold filters
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.BandedLevenshtein)
  }
}
