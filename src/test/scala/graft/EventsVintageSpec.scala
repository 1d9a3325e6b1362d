package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the round-9 outage: the driver regenerated
  * events.parquet from TIMESTAMP(NANOS) to plain timestamp[us] and the
  * old nanos-only `events()` helper broke 23 gates at analysis time.
  * Two tiny committed fixtures — identical values, one per physical
  * vintage — prove [[SparkEntry.events]] loads BOTH to the same rows,
  * so a fixture-vintage flip can never silently break gates again. */
class EventsVintageSpec extends AnyFunSuite with SparkTestBase {

  private def fixture(vintage: String): String =
    getClass.getResource(s"/events_vintage/$vintage").getPath

  test("events() loads nanos and micros vintages identically") {
    val nanos = SparkEntry.events(spark, fixture("nanos"))
    val micros = SparkEntry.events(spark, fixture("micros"))
    // both must land on TIMESTAMP after normalization
    assert(nanos.schema("ts").dataType.typeName === "timestamp")
    assert(micros.schema("ts").dataType.typeName === "timestamp")
    val a = nanos.orderBy("event_id").collect().toSeq
    val b = micros.orderBy("event_id").collect().toSeq
    assert(a.size === 20)
    assert(a === b)
  }

  test("nanos vintage truncates to the same microsecond DuckDB keeps") {
    val first = SparkEntry.events(spark, fixture("nanos"))
      .orderBy("event_id").select("ts").head().getTimestamp(0)
    // fixture row 0: 2024-01-01T00:00:00.123456 UTC
    assert(first.toInstant.toEpochMilli === 1704067200123L)
    assert(first.getNanos === 123456000)
  }
}
