package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.extensions.{LanguageModel, WordPiece}

/** Dev probe (round-15 verdict ask #5): measure the tokenizer trainers
  * where the vocabulary is actually LARGE. The "trainers are
  * vocabulary-scale, never corpus-scale" contract
  * ([[LanguageModel.bpeTrain]]/[[WordPiece.wordpieceTrain]]/
  * [[LanguageModel.unigramTrain]] all reduce the corpus to the
  * DISTINCT-WORD relation before any per-symbol work) had only been
  * benchmarked on the ~31-term-per-language gate corpus, where it is
  * trivially true. This probe times train + encode on Zipf corpora
  * (tools/gen_zipf_corpus.py) that move the two axes INDEPENDENTLY:
  *
  *   - corpus-size axis: same ~50k-word vocabulary, 4× the documents —
  *     a vocabulary-scale trainer should move only by the one corpus
  *     token-count scan (sublinear wall time), never by 4×.
  *   - vocabulary axis: same document count, ~4× the distinct words —
  *     the axis trainers are EXPECTED to scale with.
  *
  * Encode legs apply each trainer's own learned artifact back to the
  * corpus (bpeEncodeProfile / wordpieceEncodeProfile /
  * unigramViterbiProfile) — encode is corpus-scale by design (one
  * word-keyed join), so its numbers read the data-linear baseline the
  * trainers are judged against.
  *
  * Output: one JSON line — per corpus label, per leg, reps wall seconds.
  * Aggregate into PROBE_tokenizer_scale_r16.json (dev artifact).
  *
  * Usage: SPARK_GRAFT_ZIPF_DIRS="v50k_d12k:/tmp/zipf/a,v50k_d50k:/tmp/zipf/b" \
  *        SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
  *        sbt -batch "runMain graft.tools.ProbeTokenizerScale <bootLabel>"
  */
object ProbeTokenizerScale {

  def main(args: Array[String]): Unit = {
    val boot = args.headOption.getOrElse("b0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
      .getOrElse(3)
    val dirs: Seq[(String, String)] = sys.env.getOrElse(
        "SPARK_GRAFT_ZIPF_DIRS", "gate:/root/testdata/sf0.01")
      .split(",").toSeq.map { s =>
        val Array(l, p) = s.split(":", 2); (l, p)
      }
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // results(label)(leg) = per-rep wall seconds
    val results = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.LinkedHashMap[
        String, scala.collection.mutable.ListBuffer[Double]]]()
    val vocabSizes = scala.collection.mutable.LinkedHashMap[String, Long]()
    def rec(label: String, leg: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      results.getOrElseUpdate(label,
          scala.collection.mutable.LinkedHashMap())
        .getOrElseUpdate(leg, scala.collection.mutable.ListBuffer()) += dt
    }

    (1 to reps).foreach { _ =>
      dirs.foreach { case (label, dir) =>
        val d = spark.read.parquet(s"$dir/documents.parquet")
        vocabSizes.getOrElseUpdate(label,
          d.select(explode(graft.extensions.TextAnalysis
            .tokens(col("text"))).as("w")).select("w").distinct().count())

        var bpeMerges: Seq[(String, String)] = Seq.empty
        rec(label, "bpe_train") {
          bpeMerges = LanguageModel.bpeTrain(d, col("text"), nMerges = 16)
            .select("left", "right").collect()
            .map(r => (r.getString(0), r.getString(1))).toSeq
        }
        rec(label, "bpe_encode") {
          LanguageModel.bpeEncodeProfile(d, col("doc_id"), col("text"),
            bpeMerges).agg(sum("n_tokens")).collect()
        }

        var wpPieces: Seq[String] = Seq.empty
        rec(label, "wp_train") {
          wpPieces = WordPiece.wordpieceTrain(d, col("text"), nMerges = 10)
            .select("merged").collect().map(_.getString(0)).toSeq
        }
        rec(label, "wp_encode") {
          // vocab = the corpus's single-char cover (word-initial +
          // continuation forms) + the trained merged pieces
          val chars = d.select(explode(split(
              regexp_replace(lower(col("text")), "[^a-z]+", ""), ""))
              .as("c"))
            .filter(col("c") =!= "").distinct()
            .collect().map(_.getString(0)).toSeq.sorted
          val vocab = (chars ++ chars.map("##" + _) ++ wpPieces).distinct
          WordPiece.wordpieceEncodeProfile(d, col("doc_id"), col("text"),
            vocab).agg(sum("n_tokens")).collect()
        }

        var uniPieces: org.apache.spark.sql.DataFrame = null
        rec(label, "uni_train") {
          val trained = LanguageModel.unigramTrain(d, col("text"),
            vocabSize = 64, rounds = 2)
          val lastRound = trained.agg(max("round")).first().getLong(0)
          uniPieces = trained.filter(col("round") === lastRound)
            .select("piece", "score_micro").localCheckpoint()
        }
        rec(label, "uni_encode") {
          LanguageModel.unigramViterbiProfile(d, col("doc_id"), col("text"),
            uniPieces).agg(sum("n_pieces")).collect()
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val body = results.map { case (label, legs) =>
      val lj = legs.map { case (leg, ts) =>
        s""""$leg":[${ts.map(fmt).mkString(",")}]""" }.mkString(",")
      s""""$label":{"n_distinct_words":${vocabSizes(label)},$lj}"""
    }.mkString(",")
    println(s"""{"boot":"$boot","reps":$reps,"corpora":{$body}}""")
  }
}
