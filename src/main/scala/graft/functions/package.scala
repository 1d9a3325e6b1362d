package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

package object functions {

  /** 60-bit SimHash of a token array (custom codegen'd expression). */
  def simhash60(tokens: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(tokens)))

  /** Sequential-fold dot product of two array<double> columns (custom
    * codegen'd expression; bit-identical to aggregate(zip_with(...))). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
