package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

object DfOps {
  /** Re-alias every column (fresh expression ids). Self-unions in fixpoint loops can
    * otherwise hit Catalyst's Union constraint-rewrite with duplicate attribute ids
    * ("key not found: x#N") — one cheap projection decouples the lineages.
    */
  def reid(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)).toSeq: _*)
}
