package graft.tools

import graft.sources.JsonlStats

/** Measures the manifest protocol's METADATA costs as the file count
  * grows — the axis every table format eventually lives or dies on at
  * 100 TB. Three numbers per size: manifest bytes, cold
  * open-and-prune time (read + parse + plan a point lookup), and the
  * append-commit round trip (reserve, rebase = full-manifest map,
  * swap). Entries are synthetic (planning never touches data bytes —
  * that is the point of a manifest), with realistic per-entry payload:
  * pkey, five per-column bounds, non-null counts, string bounds, and
  * ~8 checkpoint pairs, matching what the writer actually emits.
  * Usage: runMain graft.tools.MetaBench — prints one JSON line per size.
  */
object MetaBench {
  def main(args: Array[String]): Unit = {
    val sizes = Seq(1000, 10000, 100000)
    sizes.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory(s"meta_bench_$n").toString
      val entries = (0 until n).map { i =>
        JsonlStats.statsLine(JsonlStats.FileStats(
          f"part-$i%07d.jsonl", i * 100.0, i * 100.0 + 99.0, 10000L,
          pkey = Some((i % 64).toString),
          cols = Map("event_id" -> (i * 10000.0, i * 10000.0 + 9999.0),
            "user_id" -> (0.0, 1e6), "value" -> (i * 100.0, i * 100.0 + 99.0)),
          colNonNull = Map("event_id" -> 10000L, "user_id" -> 10000L, "value" -> 10000L),
          strCols = Map("event_type" -> ("click", Some("view"))),
          ckpts = (1 to 8).map(k => (k * 1048576L, k * 1250L)),
          pspec = Some("bucket(64,user_id)")))
      }
      JsonlStats.commitAtomic(root, "seed", _ => entries)
      val manifestBytes = java.nio.file.Files.size(
        java.nio.file.Paths.get(root, "_stats.jsonl"))

      def med(reps: Seq[Double]): Double = reps.sorted.apply(reps.size / 2)
      // cold-ish open + prune: parse every entry, keep ~1/n of files via
      // a stats-column point predicate (the planner's real work)
      val planT = med((1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val stats = JsonlStats.readStats(root)
        val probe = (n / 2) * 100.0 + 50.0
        val kept = stats.count(s => s.min <= probe && probe <= s.max)
        require(kept == 1)
        (System.nanoTime() - t0) / 1e9
      })
      // append commit: the OCC loop's full cost at this manifest size
      // (read base, reserve slot with full bytes, rebase, swap)
      var k = n
      val commitT = med((1 to 5).map { _ =>
        val t0 = System.nanoTime()
        k += 1
        JsonlStats.commitAtomic(root, s"append-$k", base =>
          base :+ JsonlStats.statsLine(JsonlStats.FileStats(
            f"part-$k%07d.jsonl", 0.0, 1.0, 10L)))
        (System.nanoTime() - t0) / 1e9
      })
      println(s"""{"metric":"meta_bench","files":$n,""" +
        s""""manifest_mb":${f"${manifestBytes / 1048576.0}%.1f"},""" +
        s""""plan_sec":${f"$planT%.3f"},"append_commit_sec":${f"$commitT%.3f"}}""")
      graft.util.Fs.deleteRecursively(root)
    }
  }
}
