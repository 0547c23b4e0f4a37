package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

/** Column wrappers over Spark's Bloom-filter expressions (the pair
  * that powers AQE's runtime row-level filtering, not registered in
  * the public SQL function registry). A Bloom sketch of a join key
  * set is a few KB regardless of fact-table size, so it broadcasts
  * where the dim table's key set might not, and `mightContain` prunes
  * fact rows BEFORE any shuffle — false positives are fine because an
  * exact join confirms survivors. */
object BloomAgg {

  /** Aggregate a key column (pre-hashed with xxhash64) into a Bloom
    * filter sized for `items` expected keys in `bits` bits. */
  def build(hashed: Column, items: Long, bits: Long): Column =
    toColumn(new BloomFilterAggregate(toExpression(hashed),
      Literal(items), Literal(bits)).toAggregateExpression())

  /** Membership probe of an xxhash64-hashed key against a built
    * filter; null filter ⇒ null (never true). */
  def mightContain(bf: Column, hashed: Column): Column =
    toColumn(BloomFilterMightContain(toExpression(bf), toExpression(hashed)))
}
