package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

package object queries {

  /** Oracle-stable rounding: floor(x·10^s + 0.5)/10^s, written with the
    * exact same formula in every DuckDB oracle.
    *
    * Why not `round`: Spark's round(double) goes through the shortest
    * decimal string (BigDecimal HALF_UP) while DuckDB rounds the binary
    * double, so a value whose exact decimal ends in …5 (e.g. a quality
    * score of 0.72125) rounds differently per engine. With this formula
    * both engines apply identical IEEE ops to identical input bits, so
    * the outputs are bit-identical whenever the inputs are.
    */
  def rd(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
}
