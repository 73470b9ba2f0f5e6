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

  test("md5-seeded kernels equal the composed conv(substring(md5)) forms") {
    def md5h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val docs = Tables.documents(spark, sf0001).limit(200)
    // signature kernel vs the 64-lambda composed form (the r15 q30 kernel)
    val sh = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
    val badSig = sh.select(
        SketchExprs.md5MinhashSignature(col("sh"), 8).as("k"),
        array((0 until 8).map(i => array_min(transform(col("sh"),
          g => md5h60(concat(lit(s"mh$i|"), g))))): _*).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(badSig == 0, "md5MinhashSignature diverges from composed form")
    // per-token array kernel vs the per-element composed transform,
    // including empty-string tokens and an empty array
    val toks = split(trim(lower(col("text"))), "\\s+")
    val badArr = docs.select(
        SketchExprs.md5H60Array(toks).as("k"),
        transform(toks, t => md5h60(t)).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(badArr == 0, "md5H60Array diverges from composed form")
    val empty = Seq(Seq.empty[String], Seq("", "x")).toDF("a")
    val badEmpty = empty.select(
        SketchExprs.md5H60Array(col("a")).as("k"),
        transform(col("a"), t => md5h60(t)).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(badEmpty == 0, "md5H60Array diverges on empty/degenerate arrays")
    // empty shingle array: all-null signature, exactly like array_min(empty)
    val emptySig = empty.filter(size(col("a")) === 0).select(
      SketchExprs.md5MinhashSignature(col("a"), 4).as("k")).head()
    assert(emptySig.getSeq[Any](0) == Seq(null, null, null, null))
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

  test("quality-score kernel equals the composed form (docs + fuzz)") {
    import graft.pipeline.{TextAnalysis => TA}
    // real corpus: bit-identical rounded scores
    val docs = Tables.documents(spark, sf0001)
    val badDocs = docs.select(TA.qualityScore(col("text")).as("k"),
        TA.qualityScoreComposed(col("text")).as("c"))
      .filter(col("k") =!= col("c") ||
        col("k").isNull =!= col("c").isNull).count()
    assert(badDocs == 0, "qualityScore kernel diverges on the docs fixture")
    // adversarial strings: split/trim edge semantics (space-only trim,
    // leading/trailing empty tokens from non-space whitespace, "" -> [""]),
    // unicode (supplementary chars count once; Greek final sigma; İ whose
    // lowering grows), ASCII-vs-unicode punctuation, stopword case forms
    val nasty = Seq(
      null, "", " ", "  ", "\t", "\n", " \t ", "a", "the", "THE", "tHe",
      "the.", "a\tb ", "\tthe la\n", "!!! ... ;;;", "«no ascii punct»",
      "ΑΣ ΑΣ", "İT is", "emoji 😀! done", "x" * 400,
      "this that with as by at it", "word, word; word: word",
      "ab\fc\rd", "  the   quick\t\tbrown  ",
      ("the quick brown fox jumps over the lazy dog. " * 12))
    val badFuzz = nasty.toDF("text")
      .select(TA.qualityScore(col("text")).as("k"),
        TA.qualityScoreComposed(col("text")).as("c"))
      .filter(coalesce(col("k") =!= col("c"), lit(false)) ||
        col("k").isNull =!= col("c").isNull).count()
    assert(badFuzz == 0, "qualityScore kernel diverges on fuzz input")
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
