package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TopicClusterSpec extends AnyFunSuite with SparkTestSession {

  /** Two well-separated blobs along axes 0 and 1, with tiny deterministic
    * jitter on axis 2 so vectors are distinct. */
  private def blobs(perBlob: Int) = {
    import spark.implicits._
    (0 until perBlob).flatMap { i =>
      val j = i * 0.001f
      Seq((i.toLong, Array(1.0f, 0.0f, j, 0.0f)),
        (perBlob + i.toLong, Array(0.0f, 1.0f, j, 0.0f)))
    }.toDF("vec_id", "embedding")
  }

  test("well-separated blobs land in two pure clusters") {
    val df = blobs(25)
    val out = Similarity.topicClusters(df, col("vec_id"), col("embedding"),
        nClusters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val blobA = (0L until 25L).map(out)
    val blobB = (25L until 50L).map(out)
    assert(blobA.toSet.size == 1, "blob A must be one cluster")
    assert(blobB.toSet.size == 1, "blob B must be one cluster")
    assert(blobA.head != blobB.head, "blobs must separate")
  }

  test("dist2 is the squared L2 distance to the assigned centroid") {
    val df = blobs(10)
    val out = Similarity.topicClusters(df, col("vec_id"), col("embedding"),
      nClusters = 2)
    // within a pure 10-point blob jittered 0..0.009 on one axis, the centroid
    // is the blob mean: every dist2 is tiny and nonneg, inertia is their sum
    val rows = out.collect()
    assert(rows.forall(_.getDouble(2) >= 0.0))
    assert(rows.forall(_.getDouble(2) < 1e-4))
    assert(rows.length == 20)
  }

  test("assignment is total, in range, and deterministic across refits") {
    val df = blobs(20)
    val a = Similarity.topicClusters(df, col("vec_id"), col("embedding"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val b = Similarity.topicClusters(df, col("vec_id"), col("embedding"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(a.sameElements(b), "same seed + sample must refit identically")
    assert(a.length == 40)
    assert(a.forall { case (_, c) => c >= 0 && c < 4 })
  }

  test("fitCentroids returns nClusters centroids of the input dimension") {
    val cents = Similarity.fitCentroids(blobs(15), col("embedding"), 3)
    assert(cents.size == 3)
    assert(cents.forall(_.size == 4))
  }
}
