// Lives under org.apache.spark.sql for the same reason as VectorExpressions:
// wrapping catalyst expressions into Columns needs classic.ExpressionUtils.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/**
 * Column wrappers over Spark's OWN Bloom-filter expressions — the exact
 * machinery Catalyst injects for runtime shuffle-join filters
 * (`InjectRuntimeFilter`), exposed for explicit use by
 * [[graft.ext.Dedup.bloomAntiJoin]]. Nothing here is custom sketch code:
 * the aggregate builds an `org.apache.spark.util.sketch.BloomFilter` with
 * mergeable per-partition partials, and the membership probe is the
 * codegen'd `BloomFilterMightContain` (participates in whole-stage
 * codegen, so a scan-side prefilter costs one hash + bit-probe per row).
 *
 * Both sides take the PRE-HASHED key (`xxhash64(key)` → LongType): the
 * aggregate inserts the long and the probe tests the same long, exactly
 * how the runtime-filter rule wires its `XxHash64(value)` on both sides.
 */
object BloomFunctions {

  /** Aggregate a `bigint` hash column into serialized Bloom-filter bytes.
    * `expectedItems` sizes the filter (Spark caps items and bits at
    * `spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}`,
    * defaults 4M items / 64 Mbit = 8 MB — plenty for a blocklist; raise the
    * confs for a larger one). */
  def bloom_filter_agg(hashed: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(hashed), expectedItems)
        .toAggregateExpression())

  /** Codegen'd membership probe of `hashed` (bigint) against filter bytes
    * built by [[bloom_filter_agg]]. False positives at the filter's fpp;
    * NO false negatives — the contract [[graft.ext.Dedup.bloomAntiJoin]]'s
    * two-branch union relies on. */
  def bloom_might_contain(filterBytes: Array[Byte], hashed: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(Literal(filterBytes, BinaryType),
        ExpressionUtils.expression(hashed)))
}
