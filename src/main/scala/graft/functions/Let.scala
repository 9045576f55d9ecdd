package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

/** Poor-man's let-binding for Column expressions.
  *
  * Catalyst has no let: a subexpression named as a Scala `val` is INLINED
  * into every position that references it, and higher-order-function
  * lambdas re-evaluate their body per element — so a lambda that
  * references a computed array (e.g. `split(text, " ")`) recomputes it
  * for EVERY element index, turning a linear scan into O(n²) work
  * (measured 5× end-to-end on the winnowing fingerprint stage, whose
  * window-min lambda referenced the md5 gram array). `bind` routes the
  * value through a single-element `transform`, whose lambda variable is
  * evaluated once per row and read by reference thereafter — an
  * optimizer-proof guarantee, unlike materializing through a projection
  * that CollapseProject may re-inline.
  */
object Let {
  def bind(x: Column)(f: Column => Column): Column =
    element_at(transform(array(x), f), 1)
}
