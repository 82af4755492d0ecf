package graft.tools

/** Measures the optimistic-concurrency commit loop under writer
  * contention ([[graft.sources.JsonlStats.commitAtomic]]) — the cost
  * claim q231 makes qualitatively ("bounded CAS retries, never a table
  * lock") turned into numbers. Pure manifest commits (no Spark jobs):
  * isolates the commit path itself, which is what N concurrent ingest
  * jobs serialize on at any data scale — the data writes beneath them
  * are embarrassingly parallel.
  *
  * For each writer count W: W threads each land M blind-append commits
  * on one fresh table; reports wall clock, commits/sec, and verifies
  * losslessness (final entry count == W*M) and chain integrity (every
  * archived snapshot parses). Usage: runMain graft.tools.OccBench
  * [writers,writers,...] [commitsPerWriter] — prints one JSON line.
  */
object OccBench {
  def main(args: Array[String]): Unit = {
    val writerCounts = args.headOption.getOrElse("1,4,16").split(",").map(_.trim.toInt).toSeq
    val perWriter = args.lift(1).map(_.toInt).getOrElse(25)
    val results = writerCounts.map { w =>
      val root = java.nio.file.Files.createTempDirectory(s"occbench_w$w").toString
      val pool = java.util.concurrent.Executors.newFixedThreadPool(w)
      val barrier = new java.util.concurrent.CyclicBarrier(w + 1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until w).foreach { t =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try {
              barrier.await()
              (0 until perWriter).foreach { i =>
                val line = graft.sources.JsonlStats.statsLine(
                  graft.sources.JsonlStats.FileStats(f"part-w$t-$i.jsonl", t, t + 1, i + 1L))
                graft.sources.JsonlStats.commitAtomic(root, s"occbench-$t-$i",
                  base => base :+ line, maxAttempts = 200)
              }
            } catch { case e: Throwable => errs.add(e) }
        })
      }
      barrier.await()
      val t0 = System.nanoTime()
      pool.shutdown()
      require(pool.awaitTermination(600, java.util.concurrent.TimeUnit.SECONDS), "timeout")
      val wallSec = (System.nanoTime() - t0) / 1e9
      require(errs.isEmpty, s"writer failed: ${Option(errs.peek())}")
      val finalEntries = graft.sources.JsonlStats.readStats(root).size
      require(finalEntries == w * perWriter,
        s"LOST UPDATE: $finalEntries of ${w * perWriter} entries survived")
      // chain integrity: every archived snapshot parses and none
      // exceeds the final size (append-only)
      val versions = graft.sources.JsonlStats.historyVersions(root)
      versions.foreach { v =>
        val n = graft.sources.JsonlStats
          .readStats(root, s"${graft.sources.JsonlStats.HistoryDir}/v$v.jsonl").size
        require(n <= finalEntries, s"snapshot v$v larger than final")
      }
      graft.util.Fs.deleteRecursively(root)
      (w, wallSec, w * perWriter / wallSec, versions.size)
    }
    val cells = results.map { case (w, wall, rate, vers) =>
      f"""{"writers":$w,"commits":${w * perWriter},"wall_sec":$wall%.2f,"commits_per_sec":$rate%.1f,"versions":$vers}"""
    }
    println(s"""{"metric":"occ_commit_throughput","per_writer":$perWriter,"cells":[${cells.mkString(",")}]}""")
  }
}
