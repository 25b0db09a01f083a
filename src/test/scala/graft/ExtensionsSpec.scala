package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
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

  test("expression agrees with the Column API and array_intersect") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(1L, 2L, 3L, 10L), Seq(2L, 3L, 4L))).toDF("a", "b")
    val viaExpr = df.select(graft.functions.SortedIntersect.card(col("a"), col("b"))).head().getInt(0)
    val viaBuiltin = df.select(size(array_intersect(col("a"), col("b")))).head().getInt(0)
    assert(viaExpr == viaBuiltin && viaExpr == 2)
  }
}
