package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.streaming.WeatherIngest

/** Drives the LIVE HttpSource code path — request formation, query
  * encoding, concurrent fetch, body handling — against an in-process
  * loopback HTTP server (JDK HttpServer; no egress). The production
  * class runs unmodified: only `baseUrl` points at 127.0.0.1.
  */
class HttpSourceSpec extends SparkSuite {

  private def payload(city: String, temp: Double): String =
    s"""{"dt": 1704067200, "timezone": 3600, "name": "$city",
        "weather": [{"description": "clear sky"}], "main": {"temp": $temp}}"""

  private def withServer(test: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new ConcurrentLinkedQueue[String]()
    server.createContext("/data/2.5/weather", (ex: HttpExchange) => {
      val query = ex.getRequestURI.getRawQuery
      seen.add(query)
      val city = java.net.URLDecoder.decode(
        query.split("&").find(_.startsWith("q=")).get.drop(2), "UTF-8")
      val body = payload(city, temp = city.length.toDouble)
        .getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", seen)
    finally server.stop(0)
  }

  test("fetches one body per city, concurrently, with encoded query params") {
    withServer { (base, seen) =>
      val cities = Seq("Rotterdam", "New York", "São Paulo")
      val src = new WeatherIngest.HttpSource(cities, apiKey = "k123", baseUrl = base)
      val bodies = src.fetch(spark).collect()
      assert(bodies.length === 3)
      cities.foreach(c => assert(bodies.exists(_.contains(s""""name": "$c"""")),
        s"no body for $c"))
      // every request carried the key, metric units, and an ENCODED city
      val queries = seen.toArray.map(_.toString)
      assert(queries.length === 3)
      assert(queries.forall(q => q.contains("appid=k123") && q.contains("units=metric")))
      assert(queries.exists(_.contains("q=New+York")), "space must be URL-encoded")
    }
  }

  test("live-HTTP batch == replay batch through the full transform") {
    withServer { (base, _) =>
      val cities = Seq("Ams", "Oslo")
      val viaHttp = WeatherIngest.transform(
        new WeatherIngest.HttpSource(cities, "k", base).fetch(spark)).collect().toSet
      val viaReplay = WeatherIngest.transform(
        new WeatherIngest.ReplaySource(
          cities.map(c => payload(c, c.length.toDouble))).fetch(spark)).collect().toSet
      assert(viaHttp === viaReplay && viaHttp.nonEmpty)
    }
  }

  test("empty api key fails fast (config contract, weather-etl.py:106-108)") {
    val err = intercept[IllegalArgumentException] {
      new WeatherIngest.HttpSource(Seq("X"), apiKey = "")
    }
    assert(err.getMessage.contains("OPENWEATHERMAP_API_KEY"))
  }
}
