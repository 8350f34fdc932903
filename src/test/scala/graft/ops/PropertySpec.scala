package graft.ops

import java.nio.file.{Files, Paths}

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property-based invariants (SURVEY §5.2). ScalaCheck generators drive the
  * cases; sampling is explicit (the scalatest-scalacheck bridge artifact is
  * not among the allowed deps).
  */
class PropertySpec extends AnyFunSuite with SparkTestSession {

  // fixed seeds: reproducible runs
  private def forAll[T](gen: Gen[T], n: Int = 20)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach(f)
    }
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val relName = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
  private val fileGen = for {
    dir <- Gen.option(relName)
    name <- relName
    body <- Gen.listOf(Gen.asciiPrintableChar).map(_.mkString.take(200))
  } yield (dir.map(_ + "/").getOrElse("") + name, body)

  private val treeGen = Gen.listOfN(6, fileGen)
    .map(_.distinctBy(_._1.toLowerCase)) // case-insensitive-fs safe

  test("A2 determinism: content hash of a folder == hash of its deterministic zip") {
    forAll(treeGen) { files =>
      whenever(files.nonEmpty) {
        val dir = Files.createTempDirectory("prop-tree")
        files.foreach { case (rel, body) =>
          val p = dir.resolve(rel)
          Files.createDirectories(p.getParent)
          Files.writeString(p, body)
        }
        val zip = Files.createTempFile("prop", ".zip").toString
        ZipUtil.writeDeterministicZip(dir.toString, zip)
        assert(ZipUtil.contentSha256OfDirectory(dir.toString) == ZipUtil.contentSha256OfZip(zip))
        // and byte-stability: rebuilding yields the identical artifact
        val zip2 = Files.createTempFile("prop2", ".zip").toString
        ZipUtil.writeDeterministicZip(dir.toString, zip2)
        assert(ZipUtil.fileSha256(zip) == ZipUtil.fileSha256(zip2))
        ZipUtil.deleteRecursively(dir)
        Files.deleteIfExists(Paths.get(zip)); Files.deleteIfExists(Paths.get(zip2))
      }
    }
  }

  test("F7 round-trip: formatElapsed → parseElapsedSeconds is identity on seconds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    forAll(Gen.listOfN(50, Gen.choose(0L, 10L * 86400))) { secs =>
      whenever(secs.nonEmpty) {
        val got = secs.toDF("s")
          .select(Scalars.parseElapsedSeconds(Scalars.formatElapsed(col("s"))).cast("long").as("r"))
          .collect().map(_.getLong(0)).toSeq
        assert(got == secs)
      }
    }
  }

  test("F5 renumber: idempotent when token absent; width preserved") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    forAll(Gen.zip(Gen.choose(1, 999999999), Gen.alphaStr.map(_.take(30)))) { case (idx, noise) =>
      val out = Seq(s"$noise 000000001 $noise").toDF("t")
        .select(Scalars.renumberToken(col("t"), lit(idx)).as("r"))
        .collect()(0).getString(0)
      assert(out == s"$noise ${"%09d".format(idx)} $noise")
    }
  }

  test("F8 size labels: unit ladder is monotone in bytes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val units = Seq(" B", " KB", " MB", " GB", " TB")
    forAll(Gen.listOfN(30, Gen.choose(0L, 5L * 1024 * 1024 * 1024 * 1024))) { sizes =>
      whenever(sizes.nonEmpty) {
        val rows = sizes.toDF("b")
          .select(col("b"), Scalars.formatFileSize(col("b")).as("label"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        rows.foreach { case (b, label) =>
          val unit = units.indexWhere(label.endsWith)
          val expected = Seq(1024L, 1024L * 1024, 1024L * 1024 * 1024,
            1024L * 1024 * 1024 * 1024).indexWhere(b < _) match {
            case -1 => 4
            case i => i
          }
          assert(unit == expected, s"$b -> $label")
        }
      }
    }
  }

  test("ngram jaccard: bitset path ≡ array path ∀ random corpora and vocabularies") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // vocab size spans both sides of the one-long boundary and multi-word
    // masks; docs draw with replacement so exact dups, subsets and disjoint
    // sets all occur
    val corpusGen = for {
      vocabSize <- Gen.choose(1, 150)
      vocab = (0 until vocabSize).map(i => s"w$i")
      nDocs <- Gen.choose(5, 25)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(1, 12).flatMap(k =>
          Gen.listOfN(k, Gen.choose(0, vocabSize - 1)).map(_.map(vocab).mkString(" "))))
      t <- Gen.oneOf(0.2, 0.5, 0.8)
      n <- Gen.oneOf(1, 2)
    } yield (docs, t, n)
    forAll(corpusGen, n = 8) { case (docTexts, t, n) =>
      val df = docTexts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      def run(maxVocab: Int) = graft.extensions.Dedup.ngramJaccardPairs(
          df, col("doc_id"), col("text"), lit("all"), n = n, threshold = t,
          maxDictVocab = maxVocab)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      assert(run(4096).sameElements(run(0)), s"vocab<=${docTexts.size} t=$t n=$n")
    }
  }

  test("J1 registry: registering the same batch twice never grows the registry") {
    import spark.implicits._
    val entryGen = for {
      n <- Gen.choose(1, 8)
      entries <- Gen.listOfN(n, for {
        zn <- relName; zs <- relName; cs <- relName
      } yield (zn + ".zip", "z" + zs, "c" + cs, 1L, "2026-01-01 00:00:00", "uploaded"))
    } yield entries
    forAll(entryGen) { entries =>
      val cand = entries.toDF("zip_name", "zip_sha256", "content_sha256",
        "size_bytes", "created_at", "source")
      val reg0 = cand.limit(0)
      val once = Registry.register(reg0, cand)
      val twice = Registry.register(once, cand)
      assert(once.count() == twice.count())
      // and distinct content hashes survive exactly once
      assert(once.select("content_sha256").distinct().count() == once.count())
    }
  }
}
