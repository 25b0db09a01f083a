package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV/TSV source surface (SURVEY.md §2.1).
  *
  * The reference consumes its test corpora as tab-separated files with a
  * header row and double-quoted fields
  * (`examples/.../PersonDeduplicationTest.java:45-67`: CSVFormat delimiter
  * '\t', quote '"', header skipped). This is the same shape as a DataFrame
  * reader config; records then enter the typed pipeline via `.as[T]`
  * exactly like the parquet path — sources are interchangeable because the
  * operators only see Datasets.
  */
object Csv {

  /** Tab-separated read with header + quoted fields. Pass a schema for
    * production reads (inference scans the data twice and is
    * non-deterministic under schema drift); omit it only in tests.
    */
  def readTsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("quote", "\"")
    schema.fold(base.option("inferSchema", "true"))(base.schema).csv(path)
  }
}
