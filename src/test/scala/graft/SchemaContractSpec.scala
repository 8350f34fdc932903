package graft

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{CostSummary, Schemas}
import graft.ops.{CostAgg, Enrich, Grouping}
import graft.pipeline.BatchJob

/** The shapes documented in graft.model are the engine's public contract —
  * this spec keeps them from drifting away from what the operators actually
  * emit (documentation that can't go stale).
  */
class SchemaContractSpec extends AnyFunSuite with SparkTestSession {

  private lazy val files = BatchJob.documentsAsFiles(spark, "/root/testdata/sf0.001")

  test("file relation carries every Schemas.fileRow field") {
    assert(Schemas.fileRow.fieldNames.toSet.subsetOf(files.columns.toSet),
      s"missing: ${Schemas.fileRow.fieldNames.toSet -- files.columns.toSet}")
  }

  test("group relation carries every Schemas.groupRow field") {
    val groups = Grouping.buildGroups(files.limit(50), groupBySubfolder = true)
    assert(Schemas.groupRow.fieldNames.toSet.subsetOf(groups.columns.toSet),
      s"missing: ${Schemas.groupRow.fieldNames.toSet -- groups.columns.toSet}")
  }

  test("enrich output is exactly Schemas.resultRow") {
    val groups = Grouping.buildGroups(files.limit(50), groupBySubfolder = true)
    val results = Enrich.enrich(groups, () => new Enrich.MockModelClient(), Enrich.JobConfig())
    assert(results.columns.toSet == Schemas.resultRow.fieldNames.toSet)
  }

  test("cost rollup columns are exactly the CostSummary fields") {
    val groups = Grouping.buildGroups(files.limit(50), groupBySubfolder = true)
    val results = Enrich.enrich(groups, () => new Enrich.MockModelClient(), Enrich.JobConfig())
    val cost = CostAgg.summarize(results)
    val documented = Encoders.product[CostSummary].schema.fieldNames.toSet
    assert(cost.columns.toSet == documented,
      s"only-in-op: ${cost.columns.toSet -- documented}; only-in-doc: ${documented -- cost.columns.toSet}")
  }
}
