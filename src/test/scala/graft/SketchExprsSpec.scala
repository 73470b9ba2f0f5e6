package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchExprs
import graft.pipeline.Dedup

/** Native sketch kernels agree exactly with the composed column forms. */
class SketchExprsSpec extends SparkSpec {
  import spark.implicits._

  test("native minhash signature equals the composed XOR-rotate form") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16, shingleN = 3)
    val base = docs.select(col("doc_id"),
      Dedup.shingleHashPairs(Dedup.wordShingles(col("text"), 3)).as("hp"))
    val both = base.select(col("doc_id"),
      SketchExprs.minhashSignature(col("hp"), 64).as("native"),
      Dedup.minhashSignatureFromPairs(col("hp"), cfg).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native simhash equals the composed form") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val th = transform(split(trim(lower(col("text"))), "\\s+"), t => xxhash64(t))
    val both = docs.select(
      SketchExprs.simhash64(th).as("native"),
      Dedup.simhash(col("text")).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("fuzz: kernels equal composed forms on adversarial strings") {
    // seeded nasty-string generator: whitespace runs (incl. tabs/newlines
    // that Spark's space-only trim does NOT strip), unicode, empties,
    // profile stopwords, punctuation runs
    val rnd = new scala.util.Random(20260812L)
    val atoms = Seq("the", "la", "der", "el", "le", "的", "fox", "Iñtërnâtiônàližætiøn",
      "Ādam", "a", "B", "42", "!!!", "...", "x" * 30, "", " ", "\t", "\n", "  ", " ")
    val strings = Seq("", " ", "\t", "\t the la ", "a") ++
      (1 to 400).map { _ =>
        (0 until rnd.nextInt(12)).map(_ => atoms(rnd.nextInt(atoms.length)))
          .mkString(rnd.nextInt(3) match { case 0 => " "; case 1 => "\t"; case _ => "" })
      }
    val df = strings.toDF("text")
    // word shingles: set-equal for n=1 and n=3
    for (n <- Seq(1, 3)) {
      val bad = df.select(
          Dedup.wordShingles(col("text"), n).as("k"),
          Dedup.wordShinglesComposed(col("text"), n).as("c"))
        .filter(size(array_except(col("k"), col("c"))) > 0 ||
          size(array_except(col("c"), col("k"))) > 0)
        .count()
      assert(bad == 0, s"wordShingles n=$n diverges on fuzz input")
    }
    // langId: exact equality
    val badLang = df.select(
        graft.pipeline.TextAnalysis.langId(col("text")).as("k"),
        graft.pipeline.TextAnalysis.langIdComposed(col("text")).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(badLang == 0, "langId kernel diverges on fuzz input")
    // simhash + minhash kernels: pure math over shared tokenization
    val th = transform(split(trim(lower(col("text"))), "\\s+"), t => xxhash64(t))
    val badSim = df.select(SketchExprs.simhash64(th).as("k"),
        Dedup.simhashFromHashes(th).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(badSim == 0, "simhash kernel diverges on fuzz input")
    val hp = Dedup.shingleHashPairs(Dedup.wordShingles(col("text"), 2))
    val cfg = Dedup.MinHashConfig(numHashes = 16, bands = 4, shingleN = 2)
    val badMin = df.select(SketchExprs.minhashSignature(hp, 16).as("k"),
        Dedup.minhashSignatureFromPairs(hp, cfg).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(badMin == 0, "minhash kernel diverges on fuzz input")
  }

  test("native word shingles are set-equal to the composed form") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    for (n <- Seq(1, 3)) {
      val both = docs.select(
        Dedup.wordShingles(col("text"), n).as("native"),
        Dedup.wordShinglesComposed(col("text"), n).as("composed"))
      val bad = both.filter(
        size(array_except(col("native"), col("composed"))) > 0 ||
          size(array_except(col("composed"), col("native"))) > 0).count()
      assert(bad == 0, s"n=$n shingle sets diverge")
    }
  }
}
