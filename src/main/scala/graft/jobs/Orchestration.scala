package graft.jobs

import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Engine-side analogue of the reference's orchestration semantics
  * (dag_streamflow.py): `retries: 3, retry_delay: 1 minute`
  * (dag_streamflow.py:15-16), task graph
  * `ingest_user_events / ingest_transaction_events >> etl_job >>
  * validate_outputs` (dag_streamflow.py:58-88), independent tasks
  * eligible to run in parallel, and a failed task marking its
  * downstream `upstream_failed` rather than running it.
  *
  * This deliberately covers the RETRY/CHAINING semantics only — the
  * executable part of the DAG contract. Scheduling triggers
  * (`schedule_interval`, `catchup`) are wall-clock scheduler state, not
  * engine semantics, and stay out of scope (SURVEY §0/§3); the
  * reference's own DAG sets `schedule_interval=None` anyway.
  *
  * The sleeper is injected so specs assert the REQUESTED backoff
  * delays without waiting a minute per retry — the same seam a
  * production runner uses for testability.
  */
object Orchestration {

  sealed trait Status
  case object Success extends Status
  /** Failed after exhausting 1 + retries attempts. */
  final case class Failed(attempts: Int, last: Throwable) extends Status
  /** Never attempted: some transitive upstream failed. */
  case object UpstreamFailed extends Status

  /** One DAG task: `retries` re-attempts after the first failure, with
    * `retryDelayMs` between attempts — the reference's
    * `default_args` shape. `slaMs` (r16) is the declared service-level
    * bound on the task's wall time, the Airflow `sla` /
    * `sla_miss_callback` shape (Stream_Analytics_Platform.md:113):
    * exceeding it never aborts the task — monitoring is observation,
    * not control — it records an [[SlaMiss]] in the run report and
    * fires the runner's callback. */
  final case class Task(id: String,
                        upstream: Seq[String] = Nil,
                        retries: Int = 3,
                        retryDelayMs: Long = 60000L,
                        slaMs: Option[Long] = None)(val body: () => Unit)

  /** An SLA alert record: task `taskId` declared `slaMs` and took
    * `elapsedMs` wall-clock from first attempt to terminal status
    * (retry sleeps included — the consumer waits through them too). */
  final case class SlaMiss(taskId: String, slaMs: Long, elapsedMs: Long)

  /** A run's full report: terminal status per task plus every SLA miss
    * (a task can succeed AND miss — the two are independent signals). */
  final case class RunReport(status: Map[String, Status], slaMisses: Seq[SlaMiss])

  /** Execute the DAG: topological waves, tasks within a wave running
    * concurrently (the two ingest legs), each task retried per its own
    * policy. Returns the terminal status of every task. */
  def run(tasks: Seq[Task],
          sleep: Long => Unit = Thread.sleep)
         (implicit ec: ExecutionContext = ExecutionContext.global): Map[String, Status] =
    runReport(tasks, sleep).status

  /** [[run]] with the full [[RunReport]]: per-task terminal status plus
    * SLA misses. `slaMissCallback` fires as each miss is detected (the
    * alerting hook — Airflow's `sla_miss_callback`); the misses also
    * land in the report so batch consumers need no callback. `now` is
    * injectable for the same reason `sleep` is: specs assert the
    * SLA arithmetic without depending on host timing. */
  def runReport(tasks: Seq[Task],
                sleep: Long => Unit = Thread.sleep,
                slaMissCallback: SlaMiss => Unit = _ => (),
                now: () => Long = () => System.nanoTime() / 1000000L)
               (implicit ec: ExecutionContext = ExecutionContext.global): RunReport = {
    val byId = tasks.map(t => t.id -> t).toMap
    require(byId.size == tasks.size, "duplicate task id")
    tasks.foreach(t => t.upstream.foreach(u =>
      require(byId.contains(u), s"${t.id}: unknown upstream $u")))
    val status = mutable.Map.empty[String, Status]
    val misses = new java.util.concurrent.ConcurrentLinkedQueue[SlaMiss]()

    def attempt(t: Task): Status = {
      val start = now()
      def checkSla(): Unit = t.slaMs.foreach { sla =>
        val elapsed = now() - start
        if (elapsed > sla) {
          val m = SlaMiss(t.id, sla, elapsed)
          misses.add(m)
          slaMissCallback(m)
        }
      }
      var n = 0
      while (true) {
        n += 1
        // NonFatal only: an OOM/StackOverflow must kill the runner, not
        // be retried 1+retries times against a corrupted JVM
        try { t.body(); checkSla(); return Success }
        catch {
          case scala.util.control.NonFatal(e) =>
            if (n > t.retries) { checkSla(); return Failed(n, e) }
            // blocking{}: a wave of sleeping retries must not pin the
            // fixed-size global pool and starve its runnable siblings
            scala.concurrent.blocking { sleep(t.retryDelayMs) }
        }
      }
      sys.error("unreachable")
    }

    var remaining = tasks
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.upstream.forall(status.contains))
      require(ready.nonEmpty, s"dependency cycle among ${remaining.map(_.id)}")
      val (runnable, skipped) = ready.partition(_.upstream.forall(u => status(u) == Success))
      skipped.foreach(t => status(t.id) = UpstreamFailed)
      // independent runnable tasks execute concurrently (the DAG's
      // parallel ingest legs); Await re-joins the wave before its
      // downstream becomes eligible
      val done = Await.result(
        Future.sequence(runnable.map(t => Future(t.id -> attempt(t)))),
        Duration.Inf)
      done.foreach { case (id, s) => status(id) = s }
      remaining = blocked
    }
    RunReport(status.toMap, misses.toArray(Array.empty[SlaMiss]).toSeq)
  }

  /** The reference's `streamflow_main` task graph over THIS engine's
    * legs: two parallel ingest tasks (the file-buffer micro-batch
    * stands in for the Kafka consumers, faithful to the reference ETL
    * which also reads the landing buffer), the flatten ETL, and the
    * gold validation gate — with the reference's retry policy. Bodies
    * are injected so the graph is testable with both real legs and
    * fault-injecting stubs. */
  def streamflowDag(ingestUserEvents: () => Unit,
                    ingestTransactionEvents: () => Unit,
                    etlJob: () => Unit,
                    validateOutputs: () => Unit,
                    retryDelayMs: Long = 60000L): Seq[Task] = Seq(
    Task("ingest_user_events", retries = 3, retryDelayMs = retryDelayMs)(ingestUserEvents),
    Task("ingest_transaction_events", retries = 3, retryDelayMs = retryDelayMs)(ingestTransactionEvents),
    Task("etl_job", upstream = Seq("ingest_user_events", "ingest_transaction_events"),
      retries = 3, retryDelayMs = retryDelayMs)(etlJob),
    Task("validate_outputs", upstream = Seq("etl_job"),
      retries = 3, retryDelayMs = retryDelayMs)(validateOutputs),
  )
}
