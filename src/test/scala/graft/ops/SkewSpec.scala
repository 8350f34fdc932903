package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salted rewrites must be exactly equivalent to their skewed originals. */
class SkewSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // 90% of rows share one hot key — the shape salting exists for
  private lazy val skewed = spark.range(2000)
    .select(col("id"),
      when(col("id") % 10 =!= 0, lit("HOT")).otherwise(concat(lit("k"), col("id") % 7))
        .as("k"),
      (col("id") * 3 % 101).as("v"))

  test("saltedJoin equals the plain inner join on skewed data") {
    val dim = Seq(("HOT", "hot-label"), ("k0", "zero"), ("k3", "three"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k").select("id", "k", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFrom = col("id"), nSalts = 8)
      .select("id", "k", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedOrderedListAgg equals single-phase sort_array(collect_list)") {
    val elem = struct(col("v"), col("id")) // v is the sort key, id breaks ties
    val single = skewed.groupBy(col("k").as("key"))
      .agg(sort_array(collect_list(elem)).as("items"))
    val salted = Skew.saltedOrderedListAgg(skewed, col("k"), elem,
      saltFrom = col("id"), nSalts = 8)
    val joined = single.alias("a").join(salted.alias("b"), "key")
      .filter(col("a.items") =!= col("b.items"))
    assert(joined.count() == 0)
    assert(salted.count() == single.count())
  }

  test("salted buildGroups equals the single-phase core op") {
    val files = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(300)
      .select(
        concat(col("source"), lit("/doc_"), col("doc_id"), lit(".txt")).as("rel_path"),
        concat(lit("doc_"), col("doc_id"), lit(".txt")).as("file_name"),
        lit(".txt").as("file_type"), col("n_chars").cast("long").as("file_size"),
        lit("text").as("kind"), col("text").as("payload"))
    val single = Grouping.buildGroups(files, groupBySubfolder = true)
    val salted = Grouping.buildGroups(files, groupBySubfolder = true, nSalts = 8)
    assert(single.exceptAll(salted).isEmpty && salted.exceptAll(single).isEmpty)
  }

  test("saltedTopKPerKey equals the direct per-key rank window") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
    val direct = skewed.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
    val salted = Skew.saltedTopKPerKey(skewed.toDF(), Seq(col("k")),
      Seq(col("v").desc, col("id").asc), saltFrom = col("id"), k = 7, nSalts = 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("saltedTopKPerKey with k larger than any group returns everything ranked") {
    val salted = Skew.saltedTopKPerKey(skewed.toDF(), Seq(col("k")),
      Seq(col("v").asc, col("id").asc), saltFrom = col("id"), k = 100000)
    assert(salted.count() == skewed.count())
  }

  test("salt derivation is deterministic (no rand): same input, same salt") {
    val a = Skew.saltedJoin(skewed, Seq(("HOT", 1)).toDF("k", "x"), "k", col("id"), 8)
    val b = Skew.saltedJoin(skewed, Seq(("HOT", 1)).toDF("k", "x"), "k", col("id"), 8)
    assert(a.exceptAll(b).isEmpty)
  }
}
