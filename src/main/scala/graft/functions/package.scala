package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge

/** Column-facing entry points for the engine's custom expressions —
  * the graft analogue of `org.apache.spark.sql.functions`.
  */
package object functions {

  private[graft] def col(e: Expression): Column = Bridge.column(e)
  private[graft] def expr(c: Column): Expression = Bridge.expression(c)

  /** Two-sided Student-t p-value P(|T_df| >= |t|) (scipy linregress tail). */
  def t_pvalue(t: Column, df: Column): Column =
    col(TPValue(expr(t.cast("double")), expr(df.cast("double"))))

  /** Student-t CDF with `df` degrees of freedom. */
  def t_cdf(t: Column, df: Column): Column =
    col(TCdf(expr(t.cast("double")), expr(df.cast("double"))))
}
