package graft.stream

/** The transport TCK over [[ZenohTcpTransport]]: every sample, selector,
  * and reply crosses a real loopback socket as framed bytes, so the full
  * battery — delivery, undeclare, keyexpr→entry, attachments, selector
  * grammar incl. the error contract — certifies genuine wire transport,
  * not in-process call delivery. This is the closest a zero-egress build
  * gets to `integration_tests/zenoh/`: any socket transport that passes
  * this kit slots in for the native binding unchanged.
  */
class TcpZenohTransportContractSpec extends ZenohTransportContract {

  // lazy: the contract superclass registers its tests during ITS
  // constructor, before subclass vals init
  override lazy val harness: ZenohTransportHarness = new ZenohTransportHarness {
    def name = "loopback-tcp"
    def newTransport(): Zenoh.Transport = new ZenohTcpTransport
    // a fresh peer per operation exercises connection setup each time;
    // operations are synchronous (publish waits for the server ACK)
    def publish(t: Zenoh.Transport, s: Zenoh.Sample): Unit = {
      val p = new ZenohTcpTransport.Peer(t.asInstanceOf[ZenohTcpTransport].port)
      try p.publish(s) finally p.close()
    }
    def get(t: Zenoh.Transport, q: Zenoh.Query): Seq[Zenoh.Reply] = {
      val p = new ZenohTcpTransport.Peer(t.asInstanceOf[ZenohTcpTransport].port)
      try p.get(q) finally p.close()
    }
  }

  test("loopback-tcp: a throwing subscriber cannot kill the wire or starve others") {
    val t = new ZenohTcpTransport
    try {
      val seen = new java.util.concurrent.atomic.AtomicInteger(0)
      t.subscribe("graft/**") { _ => throw new RuntimeException("bad handler") }
      t.subscribe("graft/**") { _ => seen.incrementAndGet(): Unit }
      val p = new ZenohTcpTransport.Peer(t.port)
      try {
        // publish must ACK (not EOF) and reach the healthy subscriber,
        // twice — the connection survives the first handler failure
        p.publish(Zenoh.Sample("graft/e/1", Array[Byte](1)))
        p.publish(Zenoh.Sample("graft/e/2", Array[Byte](2)))
      } finally p.close()
      assert(seen.get() == 2, s"healthy subscriber saw ${seen.get()}/2 samples")
    } finally t.close()
  }
}
