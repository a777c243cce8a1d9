package graft.stream

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import scala.util.control.NonFatal

/** Loopback TCP [[Zenoh.Transport]]: the closest a zero-egress build gets
  * to the native zenoh link (api/zenoh.rs:24-41) — every sample, selector,
  * and reply crosses a REAL socket as framed bytes, so the transport TCK
  * certifies the bridge against genuine serialization, connection
  * handling, and wire ordering rather than in-process call delivery.
  * Binds 127.0.0.1 only (no egress). A real zenoh binding replaces the
  * framing with the zenoh session; the [[Zenoh.Transport]] surface and
  * everything behind it are identical.
  *
  * Wire protocol (all frames DataOutputStream-encoded, one request frame
  * per client message, responses on the same connection):
  *  - `PUBLISH` sample → server dispatches to every subscriber handler,
  *    then answers `ACK` (publish is synchronous, matching zenoh's
  *    reliable put on an established session).
  *  - `GET` query → server streams `REPLY` frames from the queryable
  *    handlers, then `END`; a handler error answers `ERR message`, which
  *    the peer rethrows as IllegalArgumentException (the selector
  *    grammar's error contract).
  * Subscriber-side keyexpr filtering is intentionally NOT performed here
  * — the bridge re-checks the namespace itself (ZenohBridge.handleSample),
  * and the TCK's misbehaving-transport test relies on that.
  */
final class ZenohTcpTransport extends Zenoh.Transport with AutoCloseable {
  import ZenohTcpTransport._

  private val subs =
    new java.util.concurrent.CopyOnWriteArrayList[Zenoh.Sample => Unit]()
  private val queryables =
    new java.util.concurrent.CopyOnWriteArrayList[Zenoh.Query => Iterator[Zenoh.Reply]]()

  private val server =
    new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  /** The bound loopback port a peer connects to. */
  def port: Int = server.getLocalPort

  @volatile private var closed = false

  private val acceptor = daemon("graft-zenoh-tcp-accept") {
    while (!closed) {
      val conn =
        try server.accept()
        catch { case _: Exception if closed => null; case NonFatal(_) => null }
      if (conn != null) daemon(s"graft-zenoh-tcp-conn") { serve(conn) }: Unit
    }
  }

  private def serve(conn: Socket): Unit = {
    val in = new DataInputStream(conn.getInputStream)
    val out = new DataOutputStream(conn.getOutputStream)
    try {
      while (true) {
        in.readByte() match {
          case Publish =>
            val s = readSample(in)
            // each handler isolated: one throwing subscriber must not
            // tear down the wire (the ACK below) or starve the others —
            // but a permanently failing handler must stay visible
            subs.forEach(h => try h(s) catch {
              case NonFatal(e) => System.err.println(
                s"[zenoh-tcp] subscriber handler failed on ${s.keyExpr}: $e")
            })
            out.writeByte(Ack); out.flush()
          case Get =>
            val q = readQuery(in)
            try {
              // stream each reply as the handler yields it — the server
              // never accumulates the result set (QueryResult::Stream
              // backpressure: the handler's iterator is pulled at socket
              // write pace). A handler failure MID-stream surfaces as an
              // Err frame after the replies already shipped, matching
              // the reference's reply_err on a failed stream drain
              // (session.rs:615-621)
              queryables.forEach { h =>
                val it = h(q)
                while (it.hasNext) {
                  out.writeByte(ReplyFrame); writeReply(out, it.next())
                }
              }
              out.writeByte(End)
            } catch { case NonFatal(e) =>
              out.writeByte(Err)
              out.writeUTF(Option(e.getMessage).getOrElse(e.getClass.getName))
            }
            out.flush()
          case other =>
            throw new IllegalStateException(s"unknown frame type $other")
        }
      }
    } catch {
      case _: EOFException => () // peer closed: normal end of connection
      case NonFatal(_) if closed => ()
    } finally conn.close()
  }

  def subscribe(keyexpr: String)(handler: Zenoh.Sample => Unit): AutoCloseable = {
    subs.add(handler)
    () => subs.remove(handler): Unit
  }

  def queryable(keyexpr: String)(handler: Zenoh.Query => Iterator[Zenoh.Reply]): AutoCloseable = {
    queryables.add(handler)
    () => queryables.remove(handler): Unit
  }

  def close(): Unit = { closed = true; server.close(); acceptor.interrupt() }
}

object ZenohTcpTransport {
  private val Publish: Byte = 1
  private val Get: Byte = 2
  private val ReplyFrame: Byte = 3
  private val End: Byte = 4
  private val Err: Byte = 5
  private val Ack: Byte = 6

  private def daemon(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => body, name)
    t.setDaemon(true); t.start(); t
  }

  private def writeBytesOpt(out: DataOutputStream, b: Option[Array[Byte]]): Unit =
    b match {
      case Some(a) => out.writeInt(a.length); out.write(a)
      case None    => out.writeInt(-1)
    }
  private def readBytesOpt(in: DataInputStream): Option[Array[Byte]] = {
    val n = in.readInt()
    if (n < 0) None else { val a = new Array[Byte](n); in.readFully(a); Some(a) }
  }
  private def writeMap(out: DataOutputStream, m: Map[String, String]): Unit = {
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) => out.writeUTF(k); out.writeUTF(v) }
  }
  private def readMap(in: DataInputStream): Map[String, String] =
    (0 until in.readInt()).map(_ => in.readUTF() -> in.readUTF()).toMap

  private def writeSample(out: DataOutputStream, s: Zenoh.Sample): Unit = {
    out.writeUTF(s.keyExpr)
    writeBytesOpt(out, Some(s.payload))
    writeBytesOpt(out, s.attachment)
    out.writeBoolean(s.timestampUs.isDefined)
    s.timestampUs.foreach(out.writeLong)
    out.writeUTF(s.contentType)
    writeMap(out, s.sourceLabels)
  }
  private def readSample(in: DataInputStream): Zenoh.Sample = {
    val key = in.readUTF()
    val payload = readBytesOpt(in).getOrElse(Array.empty[Byte])
    val attachment = readBytesOpt(in)
    val ts = if (in.readBoolean()) Some(in.readLong()) else None
    Zenoh.Sample(key, payload, attachment, ts, in.readUTF(), readMap(in))
  }

  private def writeQuery(out: DataOutputStream, q: Zenoh.Query): Unit = {
    out.writeUTF(q.keyExpr)
    writeMap(out, q.params)
    writeBytesOpt(out, q.attachment)
  }
  private def readQuery(in: DataInputStream): Zenoh.Query =
    Zenoh.Query(in.readUTF(), readMap(in), readBytesOpt(in))

  private def writeReply(out: DataOutputStream, r: Zenoh.Reply): Unit = {
    out.writeUTF(r.keyExpr)
    writeBytesOpt(out, Some(r.payload))
    writeMap(out, r.labels)
    out.writeLong(r.timestampUs)
    out.writeUTF(r.contentType)
  }
  private def readReply(in: DataInputStream): Zenoh.Reply = {
    val key = in.readUTF()
    val payload = readBytesOpt(in).getOrElse(Array.empty[Byte])
    val labels = readMap(in)
    Zenoh.Reply(key, payload, labels, in.readLong(), in.readUTF())
  }

  /** A remote peer: publishes samples and issues selectors against a
    * [[ZenohTcpTransport]] over its loopback socket — the role a second
    * zenoh session plays against the reference's runtime. One connection
    * per peer; operations are synchronous (publish waits for the ACK, so
    * a subsequent flush observes the sample). */
  final class Peer(port: Int) extends AutoCloseable {
    private val socket =
      new Socket(InetAddress.getLoopbackAddress, port)
    private val out = new DataOutputStream(socket.getOutputStream)
    private val in = new DataInputStream(socket.getInputStream)

    def publish(s: Zenoh.Sample): Unit = synchronized {
      out.writeByte(Publish); writeSample(out, s); out.flush()
      val t = in.readByte()
      require(t == Ack, s"expected ACK, got frame type $t")
    }

    def get(q: Zenoh.Query): Seq[Zenoh.Reply] = synchronized {
      out.writeByte(Get); writeQuery(out, q); out.flush()
      val replies = Seq.newBuilder[Zenoh.Reply]
      while (true) {
        in.readByte() match {
          case ReplyFrame => replies += readReply(in)
          case End        => return replies.result()
          case Err        => throw new IllegalArgumentException(in.readUTF())
          case other => throw new IllegalStateException(s"unknown frame $other")
        }
      }
      Nil // unreachable
    }

    def close(): Unit = socket.close()
  }
}
