package graft

import graft.dedup.Dedup
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The approximate-by-default caps must SIGNAL when they bind: the bucket
  * valve attaches a `graft_cap_*` observed metric whose `dropped_rows` is
  * nonzero exactly when rows were dropped before the candidate join (the
  * CapAudit listener then WARNs). */
class CapAuditSpec extends SparkSpec {

  test("bucket valve drops surface as an observed metric") {
    val sq = spark
    import sq.implicits._
    @volatile var observed = -1L
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        (qe.observedMetrics.toSeq ++ graft.dedup.CapAudit.collectMetricRows(qe.executedPlan))
          .foreach { case (n, r) =>
            if (n.startsWith("graft_cap_"))
              observed = math.max(observed, Option(r.getAs[Any]("dropped_rows")).fold(0L)(_.toString.toLong))
          }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    // ten identical docs (their shared bucket exceeds the valve and is
    // dropped) + a three-copy group that SURVIVES the valve and yields
    // candidate pairs — partial drops with a non-empty result, so AQE
    // cannot collapse the query and the observed subtree must execute
    // (all-empty output is CapAudit's documented blind spot)
    val docs = ((1 to 10).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta")) ++
      (11 to 13).map(i => (i.toLong, "one two three four five")) ++
      Seq((14L, "eleven twelve thirteen"), (15L, "fourteen fifteen sixteen")))
      .toDF("doc_id", "text")
    Dedup.simhashHammingPairs(docs, maxHamming = 1, maxBucket = 5).count()
    var waited = 0
    while (observed <= 0 && waited < 10000) { Thread.sleep(200); waited += 200 }
    assert(observed > 0, s"valve dropped rows but no graft_cap_ metric observed (got $observed)")
  }
}
