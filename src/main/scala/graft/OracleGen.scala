package graft

import graft.model.DedupConfig
import graft.sig.Signatures

/** Generates DuckDB oracle SQL that mirrors the engine's signature math
  * byte-for-byte: the shared 60-bit md5 hash, affine MinHash permutations
  * mod 2^31-1, SimHash bit sums, and band keys are all pure integer
  * arithmetic, so the oracle reproduces the Spark results exactly — the
  * LSH/banding stages themselves are mirrored, not just the final verify.
  */
object OracleGen {

  private val P = Signatures.P

  /** CTE: (doc_id, norm) — normalized document text. */
  def nrmCte: String =
    s"nrm AS (SELECT doc_id, ${Signatures.normalizeSql("text")} AS norm FROM documents)"

  /** CTE: (doc_id, sh) — distinct char k-shingles; strings shorter than k
    * contribute the whole string (mirror of Signatures.shingles).
    */
  def charShingleCtes(k: Int): String =
    s"""idx AS (
  SELECT doc_id, norm, unnest(generate_series(1, greatest(length(norm) - ${k - 1}, 1))) AS i
  FROM nrm),
sh AS (
  SELECT DISTINCT doc_id,
    CASE WHEN length(norm) >= $k THEN substr(norm, i, $k) ELSE norm END AS sh
  FROM idx)"""

  /** CTE: (doc_id, sh) — distinct word n-gram shingles (mirror of
    * Signatures.wordNgrams; docs with fewer than n words contribute the
    * whole token sequence, empty docs contribute nothing).
    */
  def wordNgramCtes(n: Int): String =
    s"""toks AS (
  SELECT doc_id, string_split(norm, ' ') AS ws FROM nrm WHERE length(norm) > 0),
idx AS (
  SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - ${n - 1}, 1))) AS i
  FROM toks),
sh AS (
  SELECT DISTINCT doc_id,
    CASE WHEN len(ws) >= $n THEN array_to_string(ws[i:i+${n - 1}], ' ')
         ELSE array_to_string(ws, ' ') END AS sh
  FROM idx)"""

  /** CTEs computing Jaccard over CTEs `sh` (shingles) and a candidate-pair
    * CTE named `cands(id1, id2)`: exact |∩|/|∪| with IEEE double division.
    * Produces CTE `pairs(id1, id2, jaccard)`.
    */
  def jaccardPairsCte(threshold: Double): String =
    s"""cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.id1, c.id2, count(*) AS c
  FROM cands c
  JOIN sh s1 ON s1.doc_id = c.id1
  JOIN sh s2 ON s2.doc_id = c.id2 AND s2.sh = s1.sh
  GROUP BY 1, 2),
pairs AS (
  SELECT i.id1, i.id2,
    CAST(i.c AS DOUBLE) / (c1.n + c2.n - i.c) AS jaccard
  FROM inter i
  JOIN cnt c1 ON c1.doc_id = i.id1
  JOIN cnt c2 ON c2.doc_id = i.id2
  WHERE CAST(i.c AS DOUBLE) / (c1.n + c2.n - i.c) >= $threshold)"""

  def jaccardVerifySql(threshold: Double): String =
    jaccardPairsCte(threshold) + "\nSELECT id1, id2, jaccard FROM pairs"

  /** All-shingle inverted-index candidate pairs, bucket-capped exactly like
    * `Blocking.pairsFromKeys(_, Some(cap))`: a shingle shared by more than
    * `cap` documents generates no pairs (skew guard, mirrored).
    */
  def invertedIndexCandsCte: String =
    s"""keyok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) BETWEEN 2 AND ${Queries.bucketCap}),
cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM keyok k JOIN sh a ON a.sh = k.sh JOIN sh b ON b.sh = k.sh AND a.doc_id < b.doc_id)"""

  /** MinHash + LSH candidate CTEs mirroring Signatures.minHash/bandKeys:
    * perms VALUES table, per-(doc, perm) min, band keys as
    * 'band:v1,v2,...,vr' strings, band-equality pairing.
    */
  def minHashCandsCtes(cfg: DedupConfig): String = {
    val a = Signatures.seedsA(cfg.numHashes, cfg.seed)
    val b = Signatures.seedsB(cfg.numHashes, cfg.seed)
    val permRows = (0 until cfg.numHashes)
      .map(i => s"(${i}, ${a(i)}, ${b(i)})").mkString(", ")
    s"""perms(i, a, b) AS (SELECT * FROM (VALUES $permRows)),
mv AS (
  SELECT s.doc_id, p.i,
    min((p.a * (${Signatures.hash60Sql("s.sh")} % $P) + p.b) % $P) AS mv
  FROM sh s CROSS JOIN perms p
  GROUP BY 1, 2),
bk AS (
  SELECT doc_id,
    (i // ${cfg.rowsPerBand}) || ':' || string_agg(mv::VARCHAR, ',' ORDER BY i) AS key
  FROM mv
  GROUP BY doc_id, i // ${cfg.rowsPerBand}),
bkok AS (SELECT key FROM bk GROUP BY key HAVING count(*) BETWEEN 2 AND ${Queries.bucketCap}),
cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bkok k JOIN bk a ON a.key = k.key JOIN bk b ON b.key = k.key AND a.doc_id < b.doc_id)"""
  }

  /** SimHash CTE mirroring Signatures.simHash over word tokens (with
    * multiplicity): yields sim(doc_id, sh BIGINT). Docs with no tokens get
    * simhash 0.
    */
  def simHashCtes(bits: Int): String =
    s"""toksm AS (
  SELECT doc_id, unnest(string_split(norm, ' ')) AS tok
  FROM nrm WHERE length(norm) > 0),
bitsum AS (
  SELECT doc_id, g.b,
    sum(CASE WHEN (${Signatures.hash60Sql("tok")} >> g.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM toksm CROSS JOIN generate_series(0, ${bits - 1}) AS g(b)
  GROUP BY 1, 2),
simnz AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
  FROM bitsum GROUP BY 1),
sim AS (
  SELECT n.doc_id, coalesce(z.sh, 0::BIGINT) AS sh
  FROM nrm n LEFT JOIN simnz z ON z.doc_id = n.doc_id)"""

  /** Bit-block pairing over CTE sim(doc_id, sh): blocks of `per` bits. */
  def bitBlockCandsCte(blocks: Int, totalBits: Int): String = {
    val per = totalBits / blocks
    s"""bkeys AS (
  SELECT doc_id, g.i || ':' || ((sh >> (g.i * $per)) & ${(1L << per) - 1}) AS key
  FROM sim CROSS JOIN generate_series(0, ${blocks - 1}) AS g(i)),
bkok AS (SELECT key FROM bkeys GROUP BY key HAVING count(*) BETWEEN 2 AND ${Queries.bucketCap}),
cands AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bkok k JOIN bkeys a ON a.key = k.key JOIN bkeys b ON b.key = k.key AND a.doc_id < b.doc_id)"""
  }

  /** Recursive CTEs for connected components over a pair CTE
    * `pairs(id1, id2)`: produces CTE `cc(doc_id, cluster_id = min reachable
    * id)`, singletons included.
    */
  def ccCte: String =
    """edges AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs),
reach(n, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r),
cc AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1)"""

  def ccSql: String =
    ccCte + "\nSELECT doc_id, cluster_id FROM cc"
}
