package graft.examples

import graft.engine.RateLimits

/** Load-tests the rate limiter's consume path itself (SCALE.md round-18):
  * every consume takes the per-kind map lock and prunes stale scopes
  * (RateLimits.consume — reference parity with limits.rs:260-283), so the
  * question is whether that lock measurably serializes HTTP dispatch when
  * ~10k distinct client IPs hammer the server concurrently. The reference
  * serves from async Rust; graft serves from a JDK HttpServer pool, where
  * a slow lock would stall dispatch threads.
  *
  * Measures: warm-populates 10k client-IP scopes, then drives 8 threads ×
  * 50k consumes each against the shared limiter and prints consumes/s.
  * REQUIREs ≥ 1M consumes/s — two orders of magnitude above anything the
  * serving layer can generate (each HTTP request costs ~0.5-0.8 ms of
  * dispatch + auth alone, so even 64 threads flat-out would need ~100k
  * consumes/s). No Spark session — the limiter is plain JVM state.
  *
  * Usage: runMain graft.examples.RateLimitLoadProbe [scopes] [threads] [perThread]
  */
object RateLimitLoadProbe {
  def main(args: Array[String]): Unit = {
    val scopes = args.headOption.map(_.toInt).getOrElse(10000)
    val threads = if (args.length > 1) args(1).toInt else 8
    val perThread = if (args.length > 2) args(2).toInt else 50000
    val rl = RateLimits.fromEnv(Map("RS_RATE_LIMIT_API" -> "1000000000req/h"))
    val ips = (0 until scopes)
      .map(i => Some(s"10.${i / 65536}.${(i / 256) % 256}.${i % 256}"))
    ips.foreach(rl.checkApiRequest) // populate the scope map
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val tasks = (0 until threads).map { t =>
      pool.submit(new Runnable { def run(): Unit = {
        var i = 0
        while (i < perThread) {
          rl.checkApiRequest(ips((t * 7919 + i) % scopes)); i += 1
        }
      }})
    }
    tasks.foreach(_.get()); pool.shutdown()
    val sec = (System.nanoTime() - t0) / 1e9
    val total = threads.toLong * perThread
    val rate = total / sec
    println(f"[rate-limit-load] $total consumes over $scopes scopes x " +
      f"$threads threads in $sec%.3f s -> $rate%.0f consumes/s")
    require(rate > 1e6,
      f"rate limiter serializes dispatch: $rate%.0f consumes/s < 1M floor")
  }
}
