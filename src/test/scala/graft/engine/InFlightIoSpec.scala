package graft.engine

import graft.SparkTestBase
import graft.engine.Auth.ApiError
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.CountDownLatch

/** `RS_IO_MAX_WRITERS_IN_FLIGHT` concurrent-write admission
  * (storage/in_flight.rs, PR-1357; reader limiting removed upstream in
  * PR-1361): semaphore semantics with a blocked holder, env parsing,
  * and the slot actually guarding the HTTP write path. */
class InFlightIoSpec extends AnyFunSuite with SparkTestBase {

  test("a full slot pool refuses a queued writer with 429 after the timeout") {
    val io = new InFlightIo(Some(1), acquireTimeoutSecs = 1L)
    val holding = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => io.withWriterSlot {
      holding.countDown(); release.await()
    })
    holder.setDaemon(true); holder.start()
    holding.await()
    assert(io.availableSlots == Some(0))
    val e = intercept[ApiError] { io.withWriterSlot(()) }
    assert(e.status == 429)
    assert(e.message.contains("in-flight writers limit exceeded"))
    release.countDown(); holder.join(5000)
    // slot returned: the next writer runs
    io.withWriterSlot(())
    assert(io.availableSlots == Some(1))
  }

  test("slots release on failure too; unset bound is a no-op") {
    val io = new InFlightIo(Some(2), acquireTimeoutSecs = 1L)
    intercept[RuntimeException] {
      io.withWriterSlot { throw new RuntimeException("write failed") }
    }
    assert(io.availableSlots == Some(2), "slot must return after a throw")
    val unbounded = new InFlightIo(None)
    unbounded.withWriterSlot(()) // no semaphore at all
    assert(unbounded.availableSlots.isEmpty)
  }

  test("env parsing: bound + timeout, invalid values unset") {
    assert(InFlightIo.fromEnv(Map(
      "RS_IO_MAX_WRITERS_IN_FLIGHT" -> "4")).availableSlots == Some(4))
    assert(InFlightIo.fromEnv(Map(
      "RS_IO_MAX_WRITERS_IN_FLIGHT" -> "0")).availableSlots.isEmpty)
    assert(InFlightIo.fromEnv(Map(
      "RS_IO_MAX_WRITERS_IN_FLIGHT" -> "oops")).availableSlots.isEmpty)
    assert(InFlightIo.fromEnv(Map.empty).availableSlots.isEmpty)
  }

  test("HTTP write path runs under the slot and returns it") {
    val store = new BucketStore(spark,
      Files.createTempDirectory("graft-inflight").toString)
    val api = new HttpApi(store, apiToken = "root",
      env = Map("RS_IO_MAX_WRITERS_IN_FLIGHT" -> "2"))
    val port = api.start()
    try {
      assert(api.inFlight.availableSlots == Some(2))
      val client = HttpClient.newHttpClient()
      def post(path: String, body: Array[Byte]): Int = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/v1$path"))
          .header("Authorization", "Bearer root")
          .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.ofByteArray()).statusCode()
      assert(post("/b/fb", Array.empty) == 200)
      assert(post("/b/fb/e?ts=1", "payload".getBytes) == 200)
      assert(api.inFlight.availableSlots == Some(2), "slot returned after write")
    } finally api.stop()
  }
}
