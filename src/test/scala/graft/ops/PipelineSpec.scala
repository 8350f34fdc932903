package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** A1 grouping + S9 enrichment over the FIXTURES.md §1.1 tree (in-memory). */
class PipelineSpec extends AnyFunSuite with SparkTestSession {

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  /** The fixture tree: top-level files, recursive subfolder, unsupported ext,
    * mixed text+image folder (FIXTURES.md §1.1).
    */
  private def fixtureFiles: DataFrame = {
    import spark.implicits._
    val rows = Seq(
      ("a.txt", bytes("alpha")),
      ("b.md", bytes("bravo")),
      ("notes.pdf", bytes("%PDF")),
      ("book1/page1.txt", bytes("one")),
      ("book1/page2.txt", bytes("two")),
      ("book1/nested/page3.md", bytes("three")),
      ("scans/cover.jpg", bytes("JPGDATA")),
      ("scans/title.png", bytes("PNGDATA"))
    )
    Ingest.withPayload(Ingest.withFileColumns(
      rows.toDF("rel_path", "content")
        .withColumn("file_size", length(col("content")).cast("long"))
        .withColumn("modified_ts", lit(null).cast("timestamp"))))
  }

  test("A1 subfolder mode: folders group recursively, top-level files stand alone") {
    val groups = Grouping.buildGroups(fixtureFiles, groupBySubfolder = true)
      .orderBy("seq").collect()
    val ids = groups.map(_.getAs[String]("group_id")).toSeq
    assert(ids == Seq("a.txt", "b.md", "book1/", "notes.pdf", "scans/"))
    val book1 = groups.find(_.getAs[String]("group_id") == "book1/").get
    assert(book1.getAs[Boolean]("is_folder"))
    assert(book1.getAs[Long]("n_files") == 3) // recursion reaches nested/
    // files inside a group are in sorted rel_path order (worker.py:20)
    val rels = book1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("files")
      .map(_.getAs[String]("rel_path")).toSeq
    assert(rels == Seq("book1/nested/page3.md", "book1/page1.txt", "book1/page2.txt"))
  }

  test("A1 flat mode: only top-level files, one group each (worker.py:40-48)") {
    val ids = Grouping.buildGroups(fixtureFiles, groupBySubfolder = false)
      .orderBy("seq").collect().map(_.getAs[String]("group_id")).toSeq
    assert(ids == Seq("a.txt", "b.md", "notes.pdf"))
  }

  test("S9 enrich: mock replies, skip rows, footer gating") {
    val groups = Grouping.withEmptyFolderGroups(
      Grouping.buildGroups(fixtureFiles, groupBySubfolder = true), Seq("empty_dir"))
    val cfg = Enrich.JobConfig(customFooter = "FOOT")
    val res = Enrich.enrich(groups, () => new Enrich.MockModelClient(), cfg)
      .orderBy("seq").collect()

    val byId = res.map(r => r.getAs[String]("group_id") -> r).toMap
    assert(byId("empty_dir/").getAs[String]("output") == "Empty folder")
    assert(byId("notes.pdf").getAs[String]("output") == "Unsupported file type")
    // skips never get a footer (worker.py:341,346-347)
    assert(!byId("notes.pdf").getAs[String]("output").contains("FOOT"))
    // successes carry the mock reply + footer
    val ok = byId("book1/").getAs[String]("output")
    assert(ok.startsWith("[mock:mock-model] group=book1/ files=3 sha256="))
    assert(ok.endsWith("\nFOOT"))
    assert(byId("book1/").getAs[String]("usage_json") != null)
    // single top-level file: unlabeled text (worker.py:79-81), 1 part
    assert(byId("a.txt").getAs[String]("output").contains("files=1"))
  }

  test("S9 image groups produce analyze-prompt + data-URL parts (worker.py:84-96)") {
    val groups = Grouping.buildGroups(fixtureFiles, groupBySubfolder = true)
    val res = Enrich.enrich(groups, () => new Enrich.MockModelClient(), Enrich.JobConfig())
      .filter(col("group_id") === "scans/").collect()(0)
    // 2 images → 4 parts (text label + image_url each)
    assert(res.getAs[String]("output").contains("files=4"))
  }

  test("S9 errors become data rows, never task failures (worker.py:342-344)") {
    val groups = Grouping.buildGroups(fixtureFiles, groupBySubfolder = true)
    // failEvery=2: every even seq throws in the client
    val res = Enrich.enrich(groups, () => new Enrich.MockModelClient(failEvery = 2),
      Enrich.JobConfig(customFooter = "FOOT"))
    val rows = res.orderBy("seq").collect()
    val failed = rows.filter(_.getAs[String]("error") != null)
    assert(failed.nonEmpty)
    assert(failed.forall(_.getAs[String]("output").startsWith("ERROR: ")))
    assert(failed.forall(!_.getAs[String]("output").contains("FOOT")))
  }

  test("A4 cost rollup counts derive from the result table (retry-safe)") {
    val groups = Grouping.withEmptyFolderGroups(
      Grouping.buildGroups(fixtureFiles, groupBySubfolder = true), Seq("empty_dir"))
    val res = Enrich.enrich(groups, () => new Enrich.MockModelClient(failEvery = 3),
      Enrich.JobConfig())
    val cs = CostAgg.summarize(res).collect()(0)
    val attempted = cs.getAs[Long]("api_requests")
    assert(attempted == cs.getAs[Long]("successful_requests") + cs.getAs[Long]("failed_requests"))
    // 6 groups total, 2 skips (empty, unsupported) → 4 attempts
    assert(attempted == 4)
    assert(cs.getAs[Long]("failed_requests") >= 1)
    assert(cs.getAs[String]("cost_unit") == "USD")
    assert(cs.getAs[Long]("total_tokens") ==
      cs.getAs[Long]("prompt_tokens") + cs.getAs[Long]("completion_tokens"))
  }

  test("A4 rollup matches the FIXTURES.md §1.4 usage fixture exactly") {
    import spark.implicits._
    val usage =
      """{"prompt_tokens": 812, "completion_tokens": 310, "total_tokens": 1122, "cost": 0.000415,
         "is_byok": false,
         "prompt_tokens_details": {"cached_tokens": 512, "cache_write_tokens": 0,
                                   "audio_tokens": 0, "video_tokens": 0},
         "completion_tokens_details": {"reasoning_tokens": 128, "audio_tokens": 0,
                                       "image_tokens": 0},
         "cost_details": {"upstream_inference_cost": 0.0004,
                          "upstream_inference_prompt_cost": 0.0003,
                          "upstream_inference_completions_cost": 0.0001}}""".replaceAll("\n\\s*", "")
    val res = Seq(
      (1L, "g1", false, "ok", Option.empty[String], Option(usage)),
      (2L, "g2", false, "ok", Option.empty[String], Option(usage)),
      (3L, "g3", false, "ERROR: x", Option("x"), Option.empty[String])
    ).toDF("seq", "group_id", "is_folder", "output", "error", "usage_json")
    val cs = CostAgg.summarize(res).collect()(0)
    assert(cs.getAs[Long]("api_requests") == 3)
    assert(cs.getAs[Long]("successful_requests") == 2)
    assert(cs.getAs[Long]("failed_requests") == 1)
    assert(cs.getAs[Long]("prompt_tokens") == 1624)
    assert(cs.getAs[Long]("reasoning_tokens") == 256)
    assert(cs.getAs[Long]("cached_tokens") == 1024)
    assert(cs.getAs[Double]("total_cost") == 0.00083)
    assert(cs.getAs[Double]("upstream_inference_prompt_cost") == 0.0006)
  }

  test("A5 observedProgress counters ride along with the consuming action") {
    val groups = Grouping.buildGroups(fixtureFiles, groupBySubfolder = true)
    val res = Enrich.enrich(groups, () => new Enrich.MockModelClient(failEvery = 3),
      Enrich.JobConfig())
    val (observed, obs) = CostAgg.observedProgress(res)
    observed.write.mode("overwrite").parquet(
      java.nio.file.Files.createTempDirectory("graft-obs").toString + "/out")
    val row = obs.get
    assert(row("processed") == 5L)
    assert(row("successful").asInstanceOf[Long] + row("failed").asInstanceOf[Long] == 4L)
  }

  test("SeqNumber matches single-partition row_number on unique keys") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ((i * 7919) % 1000, i)).toDF("k", "uniq")
    val got = SeqNumber.withGlobalSeq(df, "seq", col("k"), col("uniq"))
      .orderBy("seq").collect().map(r => (r.getAs[Int]("k"), r.getAs[Int]("uniq")))
    val want = df.orderBy(col("k"), col("uniq")).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("uniq")))
    assert(got.toSeq == want.toSeq)
    val seqs = SeqNumber.withGlobalSeq(df, "seq", col("k"), col("uniq"))
      .select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq == (1L to 1000L))
  }
}
