package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus with embedded PII-shaped strings (emails,
  * phone numbers, IPv4 addresses) for the `ta_pii` detection/redaction
  * operator. The driver's tables are PII-free by construction, so — same
  * policy as the multimodal generators — the operator's end-to-end gate runs
  * over a generated table whose bytes are a pure function of (seed, index):
  * embarrassingly parallel, any row reproducible in isolation, and dumpable
  * once as a parquet side table so the DuckDB oracle reads the identical
  * input.
  *
  * Every PII literal is synthetic (example.com-style reserved domains,
  * 555 phone exchanges, TEST-NET IP ranges) — nothing resembles a real
  * person's data.
  */
object PiiGen {

  final case class PiiDoc(doc_id: Long, text: String)

  private val words: Array[String] = Array(
    "contact", "support", "order", "ticket", "invoice", "account", "login",
    "server", "report", "status", "update", "review", "billing", "renewal",
    "outage", "incident", "summary", "thanks", "regards", "please", "reach",
    "forward", "attached", "pending", "resolved", "escalate", "primary")

  private def word(seed: Long, i: Long, salt: Long): String =
    words(((ImageGen.mix(seed, i, salt) >>> 8) % words.length).toInt)

  private def digits(seed: Long, i: Long, salt: Long, mod: Long): Long =
    java.lang.Math.floorMod(ImageGen.mix(seed, i, salt), mod)

  def email(seed: Long, i: Long, k: Int): String = {
    val s = 100 + k * 10
    s"${word(seed, i, s)}.${word(seed, i, s + 1)}${digits(seed, i, s + 2, 100)}" +
      s"@${word(seed, i, s + 3)}mail.example.com"
  }

  /** 555 exchange: reserved for fiction, never a real number. */
  def phone(seed: Long, i: Long, k: Int): String = {
    val s = 200 + k * 10
    s"+${1 + digits(seed, i, s, 89)} ${100 + digits(seed, i, s + 1, 900)}-555-" +
      f"${digits(seed, i, s + 2, 10000)}%04d"
  }

  /** TEST-NET-1 block 192.0.2.0/24 (RFC 5737): documentation-only IPs. */
  def ip(seed: Long, i: Long, k: Int): String =
    s"192.0.2.${digits(seed, i, 300 + k, 256)}"

  /** Document i: word runs interleaved with 0-2 emails, 0-1 phones and
    * 0-1 IPs (roughly a third of documents carry no PII at all).
    */
  def text(seed: Long, i: Long): String = {
    val nEmails = (digits(seed, i, 1, 6) - 3).max(0).toInt // 0,0,0,0,1,2
    val nPhones = (digits(seed, i, 2, 4) - 2).max(0).toInt // 0,0,0,1
    val nIps = (digits(seed, i, 3, 4) - 2).max(0).toInt
    val pii = (0 until nEmails).map(k => email(seed, i, k)) ++
      (0 until nPhones).map(k => phone(seed, i, k)) ++
      (0 until nIps).map(k => ip(seed, i, k))
    val runs = (0 to pii.length).map { r =>
      val n = 3 + (ImageGen.mix(seed, i, 400 + r) & 0x3).toInt
      (0 until n).map(j => word(seed, i, 500 + r * 8 + j)).mkString(" ")
    }
    runs.head + pii.zip(runs.tail).map { case (p, run) => s" $p $run" }.mkString
  }

  def generate(
      spark: SparkSession, n: Long, seed: Long = 17L,
      partitions: Int = 8): Dataset[PiiDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => PiiDoc(i, text(seed, i)))
  }
}
