package org.apache.spark.rdd

/** Test-only accessor for `RDD.isLocallyCheckpointed` (private[rdd] in the
  * Scala signature even though the JVM method is public) — CacheHygieneSpec
  * needs to tell GC-owned localCheckpoint blocks apart from leaked
  * `persist()` entries.
  */
object GraftRddIntrospect {
  def isLocalCheckpoint(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
