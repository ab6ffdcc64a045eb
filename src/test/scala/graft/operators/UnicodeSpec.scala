package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.functions.TextFunctions

/** Unicode/CJK robustness (SURVEY §2 #143/#144): graft_normalize, the
  * uSegment/uwords codepoint-aware tokenization, and their wiring behind
  * Shingles/Bpe. Oracle coverage lives in t12_unicode_tokens; these specs
  * pin the properties an oracle can't see from one corpus draw.
  */
class UnicodeSpec extends SparkSpec {

  private def norm(s: String, form: String): String =
    graft.plans.NormalizeKernel
      .normalize(UTF8String.fromString(s), graft.plans.NormalizeKernel.formOrdinal(form))
      .toString

  private def uwordsOf(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("text").select(TextFunctions.uwords(col("text")).as("w"))
      .collect()(0).getSeq[String](0)
  }

  test("graft_normalize: NFC recomposes NFD; NFKC folds fullwidth and ligatures") {
    val nfd = "café résumé"
    assert(norm(nfd, "NFC") == "café résumé")
    assert(norm("ｆｉ１２３", "NFKC") == "fi123") // fullwidth f,i + fullwidth digits
    assert(norm("ﬁle", "NFKC") == "file")            // U+FB01 'fi' ligature
    // SQL surface resolves via GraftExtensions too
    import spark.implicits._
    val viaSql = Seq(nfd).toDF("t")
      .selectExpr("graft_normalize(t, 'NFC') AS n").collect()(0).getString(0)
    assert(viaSql == "café résumé")
  }

  test("uwords: CJK segments per codepoint, Latin words stay whole, U+3000 splits") {
    assert(uwordsOf("漢字abc語 def") == Seq("漢", "字", "abc", "語", "def"))
    // ideographic space (U+3000) is a separator, not token glue
    assert(uwordsOf("abc　def") == Seq("abc", "def"))
    // Hangul and kana segment per codepoint as well
    assert(uwordsOf("한국 mix") == Seq("한", "국", "mix"))
    assert(uwordsOf("カナひら") == Seq("カ", "ナ", "ひ", "ら"))
  }

  test("NFC and NFD spellings produce identical uwords and identical unicode shingle sets") {
    import spark.implicits._
    val nfc = "café au lait café résumé 漢字"
    val nfd = java.text.Normalizer.normalize(nfc, java.text.Normalizer.Form.NFD)
    assert(nfc != nfd) // the test is vacuous unless the spellings differ
    assert(uwordsOf(nfc) == uwordsOf(nfd))
    val docs = Seq((1L, nfc), (2L, nfd)).toDF("doc_id", "text")
    val sets = Shingles.shingleRows(docs, 2, unicode = true)
      .groupBy("doc_id").agg(sort_array(collect_list("shingle")).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(sets(1L) == sets(2L), "unicode shingle path must be NFC/NFD-invariant")
    // the DEFAULT path fragments (that is the bug the unicode option fixes)
    val defaultSets = Shingles.shingleRows(docs, 2)
      .groupBy("doc_id").agg(sort_array(collect_list("shingle")).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(defaultSets(1L) != defaultSets(2L))
  }

  test("Bpe.wordCounts(unicode=true): NFC/NFD spellings count as one word; CJK counts per codepoint") {
    import spark.implicits._
    val df = Seq(
      (1L, "café café", "en", "s", 11L),
      (2L, "café", "en", "s", 5L),
      (3L, "漢字 漢字", "ja", "s", 5L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("udocs").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val counts = Bpe.wordCounts(spark, tmp, unicode = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("café") == 3L, s"NFC+NFD café occurrences must pool: $counts")
    assert(counts("漢") == 2L && counts("字") == 2L)
  }

  test("property: uwords is NFD-invariant and CJK-complete on random mixed-script text") {
    val latin = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val accented = Gen.oneOf("café", "résumé", "naïve", "über")
    val cjk = Gen.nonEmptyListOf(Gen.oneOf('漢', '字', '語', 'ひ', 'ら', 'カ', 'ナ', '한', '국'))
      .map(_.mkString)
    val piece = Gen.oneOf(latin, accented, cjk)
    val text = Gen.nonEmptyListOf(piece).map(_.mkString(" "))
    val prop = Prop.forAll(text) { t: String =>
      val nfd = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
      val a = uwordsLocal(t)
      val b = uwordsLocal(nfd)
      val cjkChars = norm(t, "NFC").count(isCjkChar)
      // NFD-invariant; every CJK codepoint becomes exactly one 1-char token
      a == b &&
        a.count(w => w.length == 1 && isCjkChar(w.head)) == cjkChars &&
        a.forall(w => w.length == 1 || !w.exists(isCjkChar))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"uwords property: ${res.status}")
  }

  private def isCjkChar(c: Char): Boolean =
    (c >= 0x3040 && c <= 0x30ff) || (c >= 0x3400 && c <= 0x4dbf) ||
      (c >= 0x4e00 && c <= 0x9fff) || (c >= 0xac00 && c <= 0xd7af)

  /** JVM-local replay of the uSegment|uwords column pipeline (keeps the
    * scalacheck loop off Spark jobs; parity with the column form is
    * pinned by the fixture tests above).
    */
  private def uwordsLocal(t: String): Seq[String] = {
    val n = norm(t, "NFC")
    val z = n.replaceAll("\\p{Z}+", " ")
    val s = z.replaceAll("(" + TextFunctions.CjkClass + ")", " $1 ")
    val trimmed = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    trimmed.split("\\s+", -1).toSeq
  }
}
