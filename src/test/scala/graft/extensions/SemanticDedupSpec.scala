package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SemanticDedupSpec extends AnyFunSuite with SparkTestSession {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def emb(rows: (Long, Seq[Float], Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v, l) => Row(i, v, l) }),
      schema)

  test("clusters colinear vectors, keeps singletons, elects per cluster") {
    // label 0: v1 ∥ v2 (cos 1 → pair), v3 ⊥ (cos 0 → singleton);
    // label 1: blocked away from label 0 even though colinear with v1.
    val df = emb(
      (1L, Seq(1f, 0f), 0), (2L, Seq(2f, 0f), 0), (3L, Seq(0f, 1f), 0),
      (4L, Seq(3f, 0f), 1))
    val out = Similarity.semanticDedup(df, col("label"), threshold = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_survivor"))).toMap
    assert(out(1L)._1 == out(2L)._1 && out(1L)._2 == 2 && out(2L)._2 == 2)
    assert(out(3L) == (3L, 1L, true))
    assert(out(4L) == (4L, 1L, true))
    // exactly one survivor in the {1,2} cluster
    assert(Seq(out(1L)._3, out(2L)._3).count(identity) == 1)
  }

  test("election keeps the row FARTHEST from the prototype (SemDeDup)") {
    // Both pair (cos ≈ 0.995 ≥ 0.9). w = [1, 0.2] is closer to the
    // prototype sum [2, 0.2] than v = [1, 0] is → v (lowest proto_sim)
    // must survive.
    val df = emb((10L, Seq(1f, 0f), 0), (11L, Seq(1f, 0.2f), 0))
    val rows = Similarity.semanticDedup(df, col("label"), threshold = 0.9)
      .select("vec_id", "proto_sim", "is_survivor").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(10L).getDouble(1) < byId(11L).getDouble(1))
    assert(byId(10L).getBoolean(2) && !byId(11L).getBoolean(2))
  }

  test("survivor count equals component count; output keeps every row") {
    val df = emb(
      (1L, Seq(1f, 0f), 0), (2L, Seq(2f, 0f), 0), (3L, Seq(4f, 0f), 0),
      (4L, Seq(0f, 2f), 0), (5L, Seq(0f, 3f), 0), (6L, Seq(1f, 1f), 1))
    val out = Similarity.semanticDedup(df, col("label"), threshold = 0.9)
    assert(out.count() == 6)
    val nComponents = out.select("component").distinct().count()
    assert(out.filter(col("is_survivor")).count() == nComponents)
    // transitive chain {1,2,3} plus {4,5} plus {6}
    assert(nComponents == 3)
  }
}
