package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.schema.Compatibility
import graft.streaming.SchemaTracker.{Adoption, SchemaEvent}

/** The reference's rotate-on-schema-change, with state surviving
  * across micro-batches (vs the batch SchemaRotation path which sees
  * all records at once). */
class SchemaTrackerSpec extends SparkSuite {

  test("BACKWARD adoption stream across micro-batches with managed state") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SchemaEvent]
    val q = SchemaTracker.adoptions(in.toDS(), Compatibility.Backward)
      .writeStream.format("memory").queryName("adoptions")
      .outputMode("append").start()

    // batch 1: v1 adopted at first sight, v2 adopted mid-batch
    in.addData(SchemaEvent(0, 0, 1), SchemaEvent(0, 1, 2), SchemaEvent(0, 2, 1))
    q.processAllAvailable()
    // batch 2: state remembers v2 — older v1 records adopt nothing,
    // v3 rotates again; a second partition starts fresh
    in.addData(SchemaEvent(0, 3, 1), SchemaEvent(0, 4, 3), SchemaEvent(1, 0, 5))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("adoptions").as[Adoption].collect().toSet
    assert(got === Set(
      Adoption(0, 0, -1, 1), Adoption(0, 1, 1, 2),
      Adoption(0, 4, 2, 3), Adoption(1, 0, -1, 5)))
  }
}
