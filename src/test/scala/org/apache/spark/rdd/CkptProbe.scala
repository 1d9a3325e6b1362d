package org.apache.spark.rdd



/** Test-only bridge: `RDD.isLocallyCheckpointed` is `private[spark]`,
  * but CkptSpec's structural invariant ("no operator hands out a
  * marked-but-unmaterialized local checkpoint — the state that can
  * deadlock a broadcast-exchange thread against the DAG scheduler")
  * needs exactly that bit. */
object CkptProbe {
  def pending(rdd: RDD[_]): Boolean =
    rdd.isLocallyCheckpointed && !rdd.isCheckpointed
}
