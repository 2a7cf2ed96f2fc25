package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * Bridge into Spark's package-private `InternalRow → DataFrame` constructor
 * (the standard technique for Spark extension libraries that hand Tungsten
 * rows straight back to SQL — compare Qbeast's `DatasetFactory` shim). Used
 * by `graft.ops.Ops.globalOrdinals` to re-enter SQL after a zipWithIndex
 * over `queryExecution.toRdd` WITHOUT a per-row external-Row ser/deser
 * round trip.
 */
object GraftInternalRows {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
