package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** EQUALITY DELETES (r9b) — the streaming-upsert half of merge-on-read,
  * the Iceberg v2 equality-delete-file shape (what a Flink/CDC writer
  * emits when it cannot know row POSITIONS: "delete every earlier row
  * with this key", not "delete file F position p"). Position deletion
  * vectors ([[JsonlDeleteVectors]]) stay the engine's answer when the
  * deleting job read the rows it deletes; equality deletes are the
  * answer when it did NOT — an upsert epoch publishes its new rows and
  * the retraction of every older row with the same keys in ONE commit,
  * without reading a byte of the 100-TB base.
  *
  * Protocol: a delete file under `_eqdels/` holds one JSON object per
  * deleted key (PHYSICAL column names, like data bytes — rename-stable);
  * the manifest carries one line per delete file:
  *
  *   {"eqdel":"_eqdels/eq-….jsonl","eq_on":["user_id"],"seq":3,"n_keys":17}
  *
  * SEQUENCE NUMBERS order deletes against data: every eqdel line and —
  * once a table has any — every data entry carries `seq` (absent = 0,
  * all pre-feature manifests), and a delete applies to a file iff
  * `file.seq < eqdel.seq` (STRICTLY — data committed WITH the delete
  * survives it, which is exactly what lets one upsert commit both
  * retract and insert a key). The Iceberg v2 sequence-number rule, on
  * this manifest's own lines.
  *
  * Scale posture: an upsert's cost is its OWN size (delta-shaped —
  * task writers ship their distinct keys, no driver collect, no base
  * read); the read-side tax is one delete-set load per task over the
  * APPLICABLE delete files (seq-filtered at planning), paid only by
  * tables that have them and only until `CALL rewrite_deletes`
  * materializes the masks back to clean files. COUNT/MIN/MAX manifest
  * pushdown DECLINES while eqdels exist (a key-scoped mask makes
  * per-file arithmetic unknowable without reading), and the feature
  * read-gates (`equality-deletes`): an unaware reader would resurrect
  * every retracted key. */
object JsonlEqualityDeletes {
  val DeletesDir = "_eqdels"

  /** One manifest-registered delete file. `file` is root-relative. */
  final case class EqDelete(file: String, cols: Seq[String], seq: Long, nKeys: Long)

  def line(d: EqDelete): String = {
    val n = new ObjectMapper().createObjectNode()
    n.put("eqdel", d.file)
    val a = n.putArray("eq_on")
    d.cols.foreach(a.add)
    n.put("seq", d.seq)
    n.put("n_keys", d.nKeys)
    n.toString
  }

  /** The eqdel lines of a raw manifest line set (dual of
    * [[JsonlStats.parseStatsLines]], which skips them). */
  def parseLines(raw: Seq[String]): Seq[EqDelete] = {
    val mapper = new ObjectMapper()
    raw.filter(_.nonEmpty).map(mapper.readTree)
      .filter(_.hasNonNull("eqdel"))
      .map { n =>
        val cols = (0 until n.get("eq_on").size()).map(i => n.get("eq_on").get(i).asText())
        EqDelete(n.get("eqdel").asText(), cols, n.get("seq").asLong(),
          if (n.hasNonNull("n_keys")) n.get("n_keys").asLong() else -1L)
      }
  }

  def readEqDeletes(root: String, manifest: String): Seq[EqDelete] =
    if (manifest != "_stats.jsonl")
      parseLines(JsonlStats.readManifestLines(root, manifest))
    else JsonlStats.cachedLive(root, "eqdels") {
      parseLines(JsonlStats.readManifestLines(root, manifest))
    }

  /** Is this raw line an eqdel entry? (vacuum/refs refcounting). */
  def filesOf(raw: Seq[String]): Seq[String] = parseLines(raw).map(_.file)

  /** CANONICAL KEY — the one encoding writer and reader share, derived
    * from JSON VALUE TYPES (both sides are JSON, so it agrees by
    * construction): integral → `l:`, text → `s:<len>:<value>`
    * (LENGTH-PREFIXED, review r9c: a raw separator join let a string
    * value containing \\u0001 forge another key's encoding and retract
    * the wrong rows — the length prefix makes each component
    * self-delimiting, so distinct tuples encode distinctly whatever
    * bytes the values hold), null/absent → a sentinel that matches
    * only itself. Key columns are restricted to long/string at the
    * write gate — float keys don't round-trip text reliably. */
  def canonicalKey(node: JsonNode, cols: Seq[String]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < cols.length) {
      if (i > 0) sb.append('\u0001')
      val v = node.get(cols(i))
      if (v == null || v.isNull) sb.append('\u0000')
      else if (v.isIntegralNumber) sb.append("l:").append(v.asLong())
      else {
        val t = v.asText()
        sb.append("s:").append(t.length).append(':').append(t)
      }
      i += 1
    }
    sb.toString
  }

  /** Reader-side: the union key set of one task's applicable delete
    * files, grouped by column list (files with the same `eq_on` share
    * one probe). `eqds` carries ABSOLUTE paths. */
  def readMasks(eqds: Seq[(String, Seq[String])]): Seq[(Seq[String], java.util.HashSet[String])] = {
    val mapper = new ObjectMapper()
    eqds.groupBy(_._2).toSeq.map { case (cols, files) =>
      val set = new java.util.HashSet[String]()
      files.foreach { case (f, _) =>
        Files.readAllLines(Paths.get(f)).asScala.foreach { l =>
          if (l.nonEmpty) set.add(canonicalKey(mapper.readTree(l), cols))
        }
      }
      (cols, set)
    }
  }

  /** Task-side key tracker for an upsert write: distinct keys of the
    * task's own rows, spilled to one delete file at commit. Bounded by
    * the task's DISTINCT keys — upserts are delta-shaped by contract
    * (the base is never read), so this is micro-batch-sized state. */
  final class KeyTracker(writeSchema: org.apache.spark.sql.types.StructType,
                         logicalCols: Seq[String],
                         columnMapping: Map[String, String]) {
    private val idxs = logicalCols.map { c =>
      val i = writeSchema.fieldNames.indexOf(c)
      require(i >= 0, s"upsert key column $c missing from write schema")
      val dt = writeSchema.fields(i).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.StringType,
        s"upsert key column $c must be long or string, got $dt")
      (i, dt)
    }
    /** Physical names — what lands in the delete file and `eq_on`. */
    val physCols: Seq[String] = logicalCols.map(c => columnMapping.getOrElse(c, c))
    private val keys = new java.util.LinkedHashMap[String, Array[Any]]()

    def add(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      val vals = new Array[Any](idxs.length)
      val sb = new java.lang.StringBuilder(32)
      var i = 0
      while (i < idxs.length) {
        if (i > 0) sb.append('\u0001')
        val (fi, dt) = idxs(i)
        if (row.isNullAt(fi)) { sb.append('\u0000'); vals(i) = null }
        else if (dt == org.apache.spark.sql.types.LongType) {
          val v = row.getLong(fi); sb.append("l:").append(v); vals(i) = java.lang.Long.valueOf(v)
        } else {
          val v = row.getUTF8String(fi).toString
          sb.append("s:").append(v.length).append(':').append(v); vals(i) = v
        }
        i += 1
      }
      keys.putIfAbsent(sb.toString, vals)
    }

    def size: Int = keys.size()

    /** Write the task's delete file; returns its root-relative name,
      * or None when the task saw no rows. Written BEFORE the commit
      * message exists — a crash leaves it unmanifested debris for the
      * age-gated orphan sweep, same as data files. */
    def writeFile(root: String, name: String): Option[String] = {
      if (keys.isEmpty) return None
      val mapper = new ObjectMapper()
      val dir = Paths.get(root, DeletesDir)
      Files.createDirectories(dir)
      val rel = s"$DeletesDir/$name"
      val lines = keys.values().asScala.map { vals =>
        val n = mapper.createObjectNode()
        physCols.zip(vals).foreach {
          case (c, null)              => n.putNull(c)
          case (c, v: java.lang.Long) => n.put(c, v.longValue())
          case (c, v: String)         => n.put(c, v)
          case (c, v) => throw new IllegalStateException(s"unexpected key value $v for $c")
        }
        n.toString
      }.toSeq
      Files.write(Paths.get(root, rel), lines.asJava)
      Some(rel)
    }
  }

  /** Highest sequence number anywhere in a base line set — what the
    * next commit stamps relative to. */
  def maxSeq(baseLines: Seq[String]): Long = {
    val dataMax = JsonlStats.parseStatsLines(baseLines).map(_.seq).maxOption.getOrElse(0L)
    val eqMax = parseLines(baseLines).map(_.seq).maxOption.getOrElse(0L)
    math.max(dataMax, eqMax)
  }

  /** THE append rebase with sequence stamping, shared by the batch and
    * streaming commit paths (review r9c: three hand-kept copies had
    * already drifted): a table with eqdels stamps every new data entry
    * at the base's max seq (existing deletes must not retract NEW
    * rows); an upsert commit takes maxSeq+1 for both its delete files
    * and its data (strict `<` applicability means its own inserts
    * survive its own retraction — the Iceberg v2 rule). Clean
    * non-upsert tables take the byte-stable fast path. */
  def stampedAppend(freshStats: Seq[JsonlStats.FileStats],
                    eqs: Seq[(String, Seq[String], Long)])(base: Seq[String]): Seq[String] = {
    val baseHasEq = parseLines(base).nonEmpty
    if (eqs.isEmpty && !baseHasEq) base ++ freshStats.map(JsonlStats.statsLine)
    else {
      val m = maxSeq(base)
      val s = if (eqs.nonEmpty) m + 1 else m
      base ++ freshStats.map(fs => JsonlStats.statsLine(fs.copy(seq = s))) ++
        eqs.map { case (f, cols, k) => line(EqDelete(f, cols, s, k)) }
    }
  }
}
