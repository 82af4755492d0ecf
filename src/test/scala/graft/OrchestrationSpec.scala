package graft

import graft.jobs.Orchestration
import graft.jobs.Orchestration.{Failed, Success, Task, UpstreamFailed}
import java.util.concurrent.atomic.AtomicInteger

/** The reference DAG's retry/chaining contract
  * (dag_streamflow.py:15-16 retries/delay; :58-88 task graph), proven
  * executable on the engine-side runner. */
class OrchestrationSpec extends SparkSpec {

  private def noSleep: Long => Unit = _ => ()

  test("retries=3: a task failing twice succeeds on the third attempt, with the declared backoff") {
    val attempts = new AtomicInteger(0)
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t = Task("flaky", retries = 3, retryDelayMs = 60000L)(() =>
      if (attempts.incrementAndGet() < 3) sys.error("transient"))
    val st = Orchestration.run(Seq(t), sleep = delays.synchronized(delays += _))
    assert(st("flaky") === Success)
    assert(attempts.get() === 3)
    assert(delays.toSeq === Seq(60000L, 60000L), "one declared delay per re-attempt")
  }

  test("a permanently failing task stops after 1+retries attempts and fails downstream, not siblings") {
    val attempts = new AtomicInteger(0)
    val ran = scala.collection.mutable.Set.empty[String]
    val dag = Seq(
      Task("broken", retries = 3, retryDelayMs = 1L)(() => { attempts.incrementAndGet(); sys.error("perm") }),
      Task("independent")(() => ran.synchronized(ran += "independent")),
      Task("downstream", upstream = Seq("broken"))(() => ran.synchronized(ran += "downstream")),
    )
    val st = Orchestration.run(dag, sleep = noSleep)
    assert(attempts.get() === 4, "1 initial + 3 retries")
    assert(st("broken").isInstanceOf[Failed])
    assert(st("downstream") === UpstreamFailed)
    assert(!ran.contains("downstream"), "upstream_failed tasks must never run")
    assert(st("independent") === Success, "an unrelated branch still runs")
  }

  test("SLA semantics (r16): a slow task COMPLETES and flags the miss with its " +
    "elapsed time, a fast task doesn't, and the miss callback fires — " +
    "monitoring is observation, not control") {
    // injected clock: each body advances simulated time, so the SLA
    // arithmetic is asserted exactly, independent of host timing
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val fired = new java.util.concurrent.ConcurrentLinkedQueue[Orchestration.SlaMiss]()
    val dag = Seq(
      Task("slow", slaMs = Some(100L))(() => { clock.addAndGet(250L); () }),
      Task("fast", upstream = Seq("slow"), slaMs = Some(100L))(() => { clock.addAndGet(10L); () }),
      Task("unbounded", upstream = Seq("fast"))(() => { clock.addAndGet(10000L); () }),
    )
    val report = Orchestration.runReport(dag, sleep = noSleep,
      slaMissCallback = fired.add(_), now = () => clock.get())
    assert(report.status.values.forall(_ == Success),
      "an exceeded SLA never aborts the task — it completes AND flags")
    assert(report.slaMisses === Seq(Orchestration.SlaMiss("slow", 100L, 250L)))
    assert(fired.toArray.toSeq === Seq(Orchestration.SlaMiss("slow", 100L, 250L)),
      "the alerting callback fires once, for the missing task only")
  }

  test("SLA clock covers retry backoff: a task that only succeeds after retries " +
    "misses when the attempts+sleeps exceed the declared bound") {
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val attempts = new AtomicInteger(0)
    val t = Task("flaky_slow", retries = 2, retryDelayMs = 60L, slaMs = Some(100L))(
      () => { clock.addAndGet(30L); if (attempts.incrementAndGet() < 3) sys.error("transient") })
    val report = Orchestration.runReport(Seq(t),
      sleep = d => { clock.addAndGet(d); () }, now = () => clock.get())
    assert(report.status("flaky_slow") === Success)
    // 3 attempts x 30ms + 2 sleeps x 60ms = 210ms elapsed > 100ms SLA
    assert(report.slaMisses === Seq(Orchestration.SlaMiss("flaky_slow", 100L, 210L)),
      "retry sleeps count toward the SLA — the consumer waits through them too")
  }

  test("chaining: both ingest legs complete before etl, etl before validate") {
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val dag = Orchestration.streamflowDag(
      ingestUserEvents = () => order.add("i1"),
      ingestTransactionEvents = () => order.add("i2"),
      etlJob = () => order.add("etl"),
      validateOutputs = () => order.add("validate"),
      retryDelayMs = 1L)
    val st = Orchestration.run(dag, sleep = noSleep)
    assert(st.values.forall(_ == Success))
    val seq = order.toArray.map(_.toString).toSeq
    assert(seq.indexOf("etl") > seq.indexOf("i1") && seq.indexOf("etl") > seq.indexOf("i2"))
    assert(seq.indexOf("validate") > seq.indexOf("etl"))
  }

  test("streamflow_main end-to-end: real ingest + ETL + validation gate under the DAG runner") {
    // the real legs: the two ingest tasks materialize their landing JSONL
    // (what the reference's consumers do), the ETL flattens to gold CSV,
    // validate raises on empty gold — all under the retrying runner
    import java.nio.file.{Files, Paths}
    val landing = Files.createTempDirectory("graft_dag_landing").toString
    val gold = Files.createTempDirectory("graft_dag_gold").toString
    val tx =
      """{"transaction_id":"t1","user_id":"u1","transaction_type":"purchase","timestamp":"2024-01-01T00:00:00Z","status":"completed","payment_method":"card","currency":"USD","line_items":[{"product_id":"p1","product_name":"A","category":"c","brand":"b","quantity":2,"unit_price":3.5}],"subtotal":7.0,"tax":0.7,"total":7.7,"billing_address":{"street":"s","city":"x","state":"st","zip_code":"z","country":"US"},"shipping_address":{"street":"s2","city":"y","state":"st","zip_code":"z2","country":"US"}}
        |""".stripMargin
    val ue =
      """{"event_id":"e1","user_id":"u1","session_id":"s1","event_type":"click","timestamp":"2024-01-01T00:00:01Z","page":"home","device":"desktop","browser":"ff","ip_address":"1.2.3.4","country":"DE","city":"B","element_id":"btn-1"}
        |""".stripMargin
    val dag = Orchestration.streamflowDag(
      ingestUserEvents = () =>
        Files.writeString(Paths.get(landing, "user_events_batch_1.json"), ue),
      ingestTransactionEvents = () =>
        Files.writeString(Paths.get(landing, "transaction_events_batch_1.json"), tx),
      etlJob = () => { graft.jobs.EtlJob.run(spark, landing, gold); () },
      validateOutputs = () => {
        val files = graft.jobs.EtlJob.validateOutputs(gold)
        require(files.nonEmpty, s"No CSV files found in $gold")
      },
      retryDelayMs = 1L)
    val st = Orchestration.run(dag, sleep = noSleep)
    assert(st.values.forall(_ == Success), st.toString)
    // and the gate genuinely gates: an empty gold dir fails the validate
    // task after its retries and the status says so
    val emptyGold = java.nio.file.Files.createTempDirectory("graft_dag_empty").toString
    val gateOnly = Seq(Task("validate_outputs", retries = 3, retryDelayMs = 1L)(() => {
      val files = graft.jobs.EtlJob.validateOutputs(emptyGold)
      require(files.nonEmpty, "No CSV files found")
    }))
    val st2 = Orchestration.run(gateOnly, sleep = noSleep)
    assert(st2("validate_outputs").isInstanceOf[Failed])
  }
}
