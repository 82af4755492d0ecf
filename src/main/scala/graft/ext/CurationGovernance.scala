package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-governance passes (SURVEY.md §2.12 [ext]) — the compliance and
  * representation controls beside [[Curation]]'s quality signals:
  *
  *   - q98 PII redaction: regex scrub of emails/phones with a residual
  *     audit (count of PII patterns surviving redaction — the contract
  *     a compliance pass actually has to certify, not just "we ran the
  *     regex"). Pure per-row codegen'd string ops: map-only over the
  *     corpus, no shuffle except the final small summary aggregate.
  *     The corpus carries no real PII, so the contact-card column is
  *     synthesized deterministically from customer fields; the
  *     REDACTION pipeline (match → count → replace → verify) is the
  *     operator under test and is mirrored exactly in the oracle.
  *   - q107 per-source caps: domain-cap pass via the native TopKPerGroup
  *     operator.
  *   - q113 fuzzy entity match: blocked edit-distance over the distinct
  *     dictionary, never row-level all-pairs.
  */
object CurationGovernance extends QueryModule {

  private val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val phoneRe = "[0-9]{3}-555-[0-9]{4}"

  /** The redaction pipeline itself, reusable on any string column:
    * (n_emails, n_phones, redacted text). */
  def redactPii(card: Column): (Column, Column, Column) = (
    size(regexp_extract_all(card, lit(emailRe), lit(0))),
    size(regexp_extract_all(card, lit(phoneRe), lit(0))),
    regexp_replace(regexp_replace(card, emailRe, "[EMAIL]"), phoneRe, "[PHONE]"),
  )

  /** q98: scrub synthesized contact cards, audit residual PII per segment. */
  def piiRedaction(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val card = concat($"c_name", lit(" contact "),
      lower(regexp_replace($"c_name", "[^a-zA-Z0-9]", "")), lit("@example.com or "),
      lpad(($"c_custkey" % 1000).cast("string"), 3, "0"), lit("-555-"),
      lpad(($"c_custkey" % 10000).cast("string"), 4, "0"))
    val (nEmail, nPhone, redacted) = redactPii(card)
    Tables.customer(spark, d)
      .select($"c_mktsegment", nEmail.as("n_email"), nPhone.as("n_phone"),
        redacted.as("redacted"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum($"n_email").cast("long").as("emails_redacted"),
        sum($"n_phone").cast("long").as("phones_redacted"),
        sum(when($"redacted".rlike(s"$emailRe|$phoneRe"), 1).otherwise(0))
          .cast("long").as("residual_pii"),
        min(md5($"redacted")).as("sample_hash"))
      .orderBy($"c_mktsegment")
  }

  private val sourceCap = 4 // max docs kept per source

  /** q107: per-source document caps — the domain-cap pass that keeps a
    * handful of over-represented sources (SEO farms, mirrors) from
    * dominating the corpus. Keep the `sourceCap` longest documents per
    * source (doc_id tiebreak), via the native TopKPerGroup operator:
    * each map partition ships at most k rows per source it saw, so the
    * exchange carries O(k · sources), never the corpus. */
  def sourceCaps(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
      .select($"source", $"doc_id", $"lang", $"n_chars")
    graft.plans.GraftOps.topKPerGroup(docs,
        groupCols = Seq("source"),
        sort = Seq("n_chars" -> true, "doc_id" -> false),
        k = sourceCap)
      .orderBy($"source", $"n_chars".desc, $"doc_id")
  }

  private val fuzzyMaxDist = 3

  /** q113: entity-resolution fuzzy match — near-identical name variants
    * found by edit distance. The scale-correct shape has two guards the
    * naive all-pairs levenshtein lacks:
    *   1. pairwise comparison runs on the DISTINCT-name dictionary
    *      (with per-name row counts carried as weights), never on the
    *      row level — dictionaries are orders of magnitude smaller than
    *      the tables they describe;
    *   2. candidate pairs are BLOCKED on a cheap structural key (the
    *      head noun) so the quadratic term is per-block, not global.
    * Output: name pairs within distance <= 3 plus each side's row
    * weight — what a dedup-review queue actually consumes. */
  def fuzzyMatch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, d)
      .groupBy($"p_name").agg(count(lit(1)).as("n_rows"))
      .withColumn("noun", element_at(split($"p_name", " "), 2))
    val a = names.select($"p_name".as("name1"), $"n_rows".as("n1"), $"noun")
    val b = names.select($"p_name".as("name2"), $"n_rows".as("n2"), $"noun")
    a.join(b, Seq("noun"))
      .filter($"name1" < $"name2")
      .withColumn("dist", levenshtein($"name1", $"name2").cast("long"))
      .filter($"dist" <= fuzzyMaxDist && $"dist" >= 1)
      .select($"name1", $"name2", $"dist", $"n1", $"n2")
      .orderBy($"name1", $"name2")
  }

  /** Users whose keys the erasure request destroyed — deterministic
    * residue slice, shared verbatim with the oracle. */
  private val forgottenResidue = 13

  /** q216: CRYPTO-SHREDDING (right to be forgotten by KEY DELETION —
    * the GDPR-erasure architecture for immutable storage: payloads are
    * encrypted per-user, "deleting" a user = destroying their key row,
    * after which their ciphertext is noise; no 100-TB rewrite, no
    * tombstone scan — erasure is O(keys), the same shape as the DV
    * tier's needle deletes but for PAYLOADS that must become
    * unrecoverable, not just unlisted).
    *
    * Engine mechanics are REAL: per-user AES-128 keys derived
    * deterministically (md5 of the user id — a test-fixture KDF, not a
    * production one, stated plainly), payloads encrypted with
    * Spark's native `aes_encrypt` (ECB so the fixture is
    * deterministic; production would use GCM + random IVs), the
    * erasure drops key rows, and the surviving-readable view is
    * ciphertext ⋈ keys → `aes_decrypt`. The round-trip (decrypt ∘
    * encrypt ≡ id) and the unreadability of keyless rows are engine
    * facts proven in CurationSpec; the ORACLE pins the governance
    * SEMANTICS (which rows remain readable and their aggregate), which
    * AES itself cannot change — DuckDB has no AES, and hashing
    * ciphertext would only pin a vendor's padding bytes. */
  def cryptoShred(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // the key vault: one AES-128 key per user (16-byte binary)
    val vault = e.select($"user_id").distinct()
      .select($"user_id",
        substring(md5($"user_id".cast("string")).cast("binary"), 1, 16).as("key"))
    // encrypted-at-rest payload store (the immutable 100-TB side)
    val store = e.join(vault, "user_id")
      .select($"event_id", $"user_id", $"event_type",
        aes_encrypt($"value".cast("string").cast("binary"), $"key", lit("ECB")).as("payload"))
    // erasure request: destroy every key of the residue-13 users
    val survivingKeys = vault.filter($"user_id" % 100 =!= forgottenResidue)
    // the readable view: only rows whose key still exists decrypt
    store.join(survivingKeys, "user_id")
      .select($"event_type",
        aes_decrypt($"payload", $"key", lit("ECB")).cast("string").cast("double").as("v"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_readable"),
        graft.util.Det.msum($"v").as("value_sum"))
      .orderBy($"event_type")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q98_pii_redaction" -> piiRedaction,
    "q107_source_caps"  -> sourceCaps,
    "q113_fuzzy_match"  -> fuzzyMatch,
    "q216_crypto_shred" -> cryptoShred,
  )

  val oracles = Map(
    "q98_pii_redaction" ->
      s"""WITH profile AS (
         |  SELECT c_custkey, c_mktsegment,
         |    c_name || ' contact ' || lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g'))
         |      || '@example.com or ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
         |      || '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS card
         |  FROM customer
         |), red AS (
         |  SELECT c_mktsegment,
         |    len(regexp_extract_all(card, '$emailRe')) AS n_email,
         |    len(regexp_extract_all(card, '$phoneRe')) AS n_phone,
         |    regexp_replace(regexp_replace(card, '$emailRe', '[EMAIL]', 'g'),
         |                   '$phoneRe', '[PHONE]', 'g') AS redacted
         |  FROM profile
         |)
         |SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
         |  CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
         |  CAST(SUM(CASE WHEN regexp_matches(redacted, '$emailRe|$phoneRe')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS residual_pii,
         |  min(md5(redacted)) AS sample_hash
         |FROM red GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q107_source_caps" ->
      s"""SELECT source, doc_id, lang, n_chars FROM (
         |  SELECT source, doc_id, lang, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM documents
         |) WHERE rn <= $sourceCap
         |ORDER BY source, n_chars DESC, doc_id""".stripMargin,
    "q216_crypto_shred" ->
      s"""SELECT event_type, count(*) AS n_readable,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
         |FROM events
         |WHERE user_id % 100 <> $forgottenResidue
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,
    "q113_fuzzy_match" ->
      s"""WITH names AS (
         |  SELECT p_name, COUNT(*) AS n_rows,
         |    string_split(p_name, ' ')[2] AS noun
         |  FROM part GROUP BY p_name
         |)
         |SELECT a.p_name AS name1, b.p_name AS name2,
         |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
         |  a.n_rows AS n1, b.n_rows AS n2
         |FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
         |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $fuzzyMaxDist
         |ORDER BY name1, name2""".stripMargin,
  )
}
