package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // extensions apply only at session CREATION: getOrCreate after another
    // spec's session exists would silently return it without the
    // extensions, so force a fresh session (same SparkContext is fine)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("extensions-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("sorted_intersect_card is callable from SQL") {
    val got = spark.sql(
      "SELECT sorted_intersect_card(array(1L, 3L, 5L, 7L), array(2L, 3L, 5L, 9L)) AS c")
      .head().getInt(0)
    assert(got == 2)
    // null propagates
    val n = spark.sql("SELECT sorted_intersect_card(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .head()
    assert(n.isNullAt(0))
  }

  test("full signature-kernel surface is callable from SQL and matches the Scala kernels") {
    import graft.sig.Signatures
    val norm = spark.sql("SELECT normalize_text('Héllo (ignore me) World!') AS n")
      .head().getString(0)
    assert(norm == Signatures.normalize("Héllo (ignore me) World!"))

    val shs = spark.sql("SELECT hashed_shingles('abcdef', 5) AS a").head().getSeq[Long](0)
    assert(shs == Signatures.shingles("abcdef", 5).map(Signatures.fastHash).distinct.sorted)

    val sh = spark.sql("SELECT simhash_words('the quick brown fox', 60) AS s").head().getLong(0)
    assert(sh == Signatures.simHashWith(Signatures.words("the quick brown fox"), 60,
      Signatures.fastHash))
    val shSlow = spark.sql("SELECT simhash_words('the quick brown fox', 60, false) AS s")
      .head().getLong(0)
    assert(shSlow == Signatures.simHash(Signatures.words("the quick brown fox"), 60))

    // the SQL pipeline composes end-to-end: normalize -> shingle -> minhash
    // -> band keys, equal to the Scala feature kernels
    val row = spark.sql(
      """SELECT band_keys(minhash_sig(transform(array('ab','cd'), s -> xxhash64(s)), 16, 42), 4)
           AS bk""").head().getSeq[String](0)
    val hs = Seq("ab", "cd").map(Signatures.fastHash)
    val sig = Signatures.minHashFromHashes(hs, Signatures.seedsA(16, 42L), Signatures.seedsB(16, 42L))
    assert(row == Signatures.bandKeys(sig, 4))

    val bb = spark.sql("SELECT bit_block_keys(12345678901234, 4, 60) AS b")
      .head().getSeq[String](0)
    assert(bb == Signatures.bitBlockKeys(12345678901234L, 4, 60))

    val dot = spark.sql(
      "SELECT float_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d")
      .head().getDouble(0)
    assert(dot == 32.0)

    // config args must be literals, not columns
    val err = intercept[Exception] {
      spark.sql("SELECT hashed_shingles('abc', id + 1) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("expression agrees with the Column API and array_intersect") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(1L, 2L, 3L, 10L), Seq(2L, 3L, 4L))).toDF("a", "b")
    val viaExpr = df.select(graft.functions.SortedIntersect.card(col("a"), col("b"))).head().getInt(0)
    val viaBuiltin = df.select(size(array_intersect(col("a"), col("b")))).head().getInt(0)
    assert(viaExpr == viaBuiltin && viaExpr == 2)
  }
}
