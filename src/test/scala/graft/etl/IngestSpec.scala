package graft.etl

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S1 ingestion: HTTP fetch against a loopback server (zero-egress
  * environment), then the fetched CSV flows through the explicit-schema
  * reader — the reference's download→load chain end-to-end.
  */
class IngestSpec extends AnyFunSuite {

  private val csvBody =
    ("Year,Month,DayofMonth,DayOfWeek,DepTime,CRSDepTime,ArrTime,CRSArrTime," +
      "UniqueCarrier,FlightNum,TailNum,ActualElapsedTime,CRSElapsedTime,AirTime," +
      "ArrDelay,DepDelay,Origin,Dest,Distance,TaxiIn,TaxiOut,Cancelled," +
      "CancellationCode,Diverted,CarrierDelay,WeatherDelay,NASDelay," +
      "SecurityDelay,LateAircraftDelay\n" +
      "2008,1,1,2,630,630,800,805,AA,1,N1,90,95,80,-5,0,JFK,BOS,187,5,5,0,,0,,,,,\n" +
      "2008,1,2,3,955,1000,1200,1210,DL,2,N2,125,130,110,-10,-5,ATL,MCO,403,7,8,0,,0,,,,,\n")

  test("fetch downloads over HTTP, is idempotent, and feeds the CSV reader") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/flights.csv", new HttpHandler {
        def handle(x: HttpExchange): Unit = {
          val bytes = csvBody.getBytes("UTF-8")
          x.sendResponseHeaders(200, bytes.length)
          x.getResponseBody.write(bytes)
          x.close()
        }
      })
      server.start()
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/flights.csv"
      val dest = java.nio.file.Files.createTempDirectory("graft_ingest").toString
      val p = Ingest.fetch(url, dest, "flights.csv")
      assert(java.nio.file.Files.readString(p) == csvBody)
      // Idempotent: second fetch keeps the existing file (same mtime).
      val mtime = java.nio.file.Files.getLastModifiedTime(p)
      assert(Ingest.fetch(url, dest, "flights.csv") == p)
      assert(java.nio.file.Files.getLastModifiedTime(p) == mtime)
      // The fetched file reads through the explicit-schema CSV source.
      val df = Sources.csv(TestSpark.spark, p.toString, FlightSchema.schema)
      assert(df.count() == 2)
      assert(df.columns.length == 29)
    } finally server.stop(0)
  }

  test("fetch surfaces HTTP errors and leaves no partial file") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/missing", new HttpHandler {
        def handle(x: HttpExchange): Unit = {
          x.sendResponseHeaders(404, -1); x.close()
        }
      })
      server.start()
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/missing"
      val dest = java.nio.file.Files.createTempDirectory("graft_ingest2").toString
      intercept[java.io.IOException] { Ingest.fetch(url, dest, "missing.csv") }
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dest, "missing.csv")))
    } finally server.stop(0)
  }
}
