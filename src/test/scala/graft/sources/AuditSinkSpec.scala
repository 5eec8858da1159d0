package graft.sources

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class AuditSinkSpec extends AnyFunSuite with SparkFixture {

  test("commit aggregates one message per partition with exact row counts") {
    val spark2 = spark
    import spark2.implicits._
    (0L until 1000L).toDF("id").repartition(5)
      .write.format("graft.sources.AuditSink")
      .option("runId", "spec-ok").mode("append").save()
    val audit = AuditSink.results("spec-ok")
    assert(audit.committed)
    assert(audit.partitionRows.size == 5, "one commit message per partition")
    assert(audit.totalRows == 1000L)
    assert(audit.partitionRows.keySet == Set(0, 1, 2, 3, 4))
  }

  test("a failing partition aborts the write and publishes nothing") {
    val spark2 = spark
    import spark2.implicits._
    intercept[Exception] {
      (0L until 100L).toDF("id").repartition(4)
        .write.format("graft.sources.AuditSink")
        .option("runId", "spec-fail").option("failPartition", "2")
        .mode("append").save()
    }
    val audit = AuditSink.results("spec-fail")
    assert(!audit.committed)
    assert(audit.totalRows == 0L, "an aborted write must publish no rows")
  }
}
