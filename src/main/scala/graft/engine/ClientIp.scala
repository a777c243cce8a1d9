package graft.engine

import java.net.{Inet6Address, InetAddress}

/** RFC 7239 `Forwarded` / `X-Forwarded-For` client-IP resolution for the
  * token IP allowlist (api/http/middleware/client_ip.rs, PR-1546).
  *
  * Forward headers are honored ONLY when the socket peer is a trusted
  * proxy (loopback / private / link-local — a reverse proxy on the local
  * network); a directly-connected external client cannot spoof its way
  * past an allowlist by sending `Forwarded: for=…`. The originating
  * client is the FIRST hop of either header, `Forwarded` preferred.
  *
  * Addresses are returned in Java's canonical `getHostAddress` form
  * (dotted quad / uncompressed v6) — the same form the socket peer
  * resolves to, so allowlist entries compare consistently either way.
  */
object ClientIp {

  /** `header` looks up a request header by name (first value). */
  def resolve(peer: Option[InetAddress],
      header: String => Option[String]): Option[String] =
    peer.map { p =>
      if (isTrustedProxy(p))
        header("Forwarded").flatMap(parseForwardedFor)
          .orElse(header("X-Forwarded-For").flatMap(parseXForwardedFor))
          .getOrElse(p.getHostAddress)
      else p.getHostAddress
    }

  /** v4: loopback | private (10/8, 172.16/12, 192.168/16 — Java's
    * site-local set) | link-local. v6: loopback | unique-local (fc00::/7)
    * | unicast link-local (fe80::/10). Mirrors is_trusted_proxy_v4/v6. */
  def isTrustedProxy(ip: InetAddress): Boolean = ip match {
    case v6: Inet6Address =>
      v6.isLoopbackAddress || (v6.getAddress()(0) & 0xfe) == 0xfc ||
        v6.isLinkLocalAddress
    case v4 =>
      v4.isLoopbackAddress || v4.isSiteLocalAddress || v4.isLinkLocalAddress
  }

  /** First comma-separated element as an IP literal; anything else
    * (`unknown`, obfuscated tokens) → None. */
  def parseXForwardedFor(value: String): Option[String] =
    value.split(",", 2).headOption.map(_.trim).flatMap(parseIpLiteral)

  /** RFC 7239: comma-separated proxy hops with the originating client
    * first; `;`-separated params within a hop. Returns the first hop
    * carrying a usable `for=` address (obfuscated `_hidden` hops are
    * skipped, matching parse_forwarded_for). */
  def parseForwardedFor(value: String): Option[String] =
    value.split(',').iterator.flatMap(parseForwardedHop).nextOption()

  private def parseForwardedHop(hop: String): Option[String] =
    hop.split(';').iterator.flatMap { part =>
      part.split("=", 2) match {
        case Array(k, v) if k.trim.equalsIgnoreCase("for") =>
          val unquoted = {
            val t = v.trim
            if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
              t.substring(1, t.length - 1).trim
            else t
          }
          // "[v6]" → inner; "[v6]:port" keeps the brackets and fails the
          // literal parse below (same as the reference's strip pair)
          val token =
            if (unquoted.startsWith("[") && unquoted.endsWith("]"))
              unquoted.substring(1, unquoted.length - 1)
            else unquoted
          parseIpLiteral(token).orElse {
            // "ip:port" with exactly one colon → v4 with a port
            if (token.count(_ == ':') == 1)
              parseIpLiteral(token.takeWhile(_ != ':'))
            else None
          }
        case _ => None
      }
    }.nextOption()

  /** Parse an IP literal WITHOUT DNS: a hostname would make
    * InetAddress.getByName resolve it, so only strings that cannot be a
    * hostname (valid dotted quad; `:`-containing v6 shapes) reach it. */
  private[engine] def parseIpLiteral(s: String): Option[String] = {
    val v4 = s.split('.')
    if (v4.length == 4 && v4.forall(o =>
        o.nonEmpty && o.length <= 3 && o.forall(_.isDigit) && o.toInt <= 255))
      Some(v4.map(_.toInt).mkString("."))
    else if (s.contains(':') && s.forall(c =>
        c.isDigit || c == ':' || c == '.' ||
          ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')))
      try Some(InetAddress.getByName(s).getHostAddress)
      catch { case _: java.net.UnknownHostException => None }
    else None
  }
}
