package graft

import graft.engine.{BucketStore, HttpApi}

/** Standalone server entry point — the analog of the reference binary's
  * launcher (reductstore/src/launcher.rs + cfg.rs): boots a complete
  * instance from the `RS_*` environment, so a reference operator can
  * point their deployment scripts here.
  *
  * Env surface handled HERE (everything else — tokens, buckets,
  * replication, lifecycle, rate limits, io bounds, zenoh, CORS, system
  * events — is parsed inside [[graft.engine.HttpApi]] /
  * [[graft.engine.Provisioning]] / [[graft.stream.ZenohBridge]] from the
  * same map):
  *   - RS_DATA_PATH   (default /data; any Hadoop FS URI works — an
  *                     s3a://bucket/prefix data path IS the remote-bucket
  *                     deployment, with the FS connector supplying the
  *                     RS_REMOTE_* credential surface via standard
  *                     fs.s3a.* configuration)
  *   - RS_HOST        (default 0.0.0.0), RS_PORT (default 8383)
  *   - RS_API_BASE_PATH (route prefix before /api/v1)
  *   - RS_API_TOKEN   (empty = open instance)
  *   - RS_LOG_LEVEL   (TRACE/DEBUG/INFO/WARN/ERROR → Spark log level)
  *   - RS_INSTANCE_ROLE (STANDALONE/PRIMARY/SECONDARY/REPLICA — replica
  *                     opens the store read-only and never claims the
  *                     writer lock)
  *   - RS_CERT_PATH + RS_CERT_KEY_PATH → TLS. JVM-idiomatic key
  *     material: RS_CERT_PATH is a PKCS12 keystore, RS_CERT_KEY_PATH a
  *     file holding its passphrase (the reference takes a PEM pair;
  *     same deployment contract, different container format —
  *     documented divergence).
  *   - RS_ENGINE_ENABLE_INTEGRITY_CHECKS (default true) → parquet page
  *     checksum verification on reads (the reference's block integrity
  *     checks; storage_engine.rs:13).
  *   - GRAFT_SPARK_MASTER (graft-specific, default local[*]) — the
  *     Spark master this instance computes on; a real cluster URL turns
  *     one serving instance into a cluster-backed engine.
  *
  * Runs until the process is terminated; a shutdown hook stops the API
  * (final usage/audit flush) and releases the store's writer lock.
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val env = sys.env
    val master = env.getOrElse("GRAFT_SPARK_MASTER", "local[*]")
    val spark = GraftSession.builder(master, "graft-server")
      .config("spark.hadoop.parquet.page.verify-checksum.enabled",
        env.get("RS_ENGINE_ENABLE_INTEGRITY_CHECKS")
          .forall(v => v.equalsIgnoreCase("true") || v == "1").toString)
      .getOrCreate()
    // RS_LOG_LEVEL (cfg.rs log_level): map the reference's levels onto
    // log4j's; TRACE stays TRACE, the default INFO is Spark's WARN to
    // keep the console usable
    spark.sparkContext.setLogLevel(
      env.getOrElse("RS_LOG_LEVEL", "INFO").toUpperCase match {
        case "TRACE" => "TRACE"
        case "DEBUG" => "DEBUG"
        case "WARN"  => "WARN"
        case "ERROR" => "ERROR"
        case _       => "WARN"
      })
    val dataPath = env.getOrElse("RS_DATA_PATH", "/data")
    // RS_LOCK_FILE_ENABLED/TTL/TIMEOUT/POLLING_INTERVAL/FAILURE_ACTION
    // configure the writer-lock acquisition (cfg/lock_file.rs)
    graft.engine.WriterLock.configure(env)
    // RS_EXT_PATH: load #ext processor jars (ext/ext_repository.rs)
    env.get("RS_EXT_PATH").filter(_.nonEmpty).foreach { dir =>
      val n = graft.engine.Processors.loadExtensionsFrom(dir)
      println(s"[ext] loaded $n processor(s) from $dir")
    }
    val replica = env.getOrElse("RS_INSTANCE_ROLE", "STANDALONE")
      .equalsIgnoreCase("replica")
    val store = new BucketStore(spark, dataPath, readOnly = replica)
    val ssl = env.get("RS_CERT_PATH").map { ksPath =>
      val pass = env.get("RS_CERT_KEY_PATH")
        .map(p => new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8").trim)
        .getOrElse("")
      HttpApi.sslContext(ksPath, pass)
    }
    val api = new HttpApi(store,
      apiToken = env.getOrElse("RS_API_TOKEN", ""),
      port = env.get("RS_PORT").flatMap(_.toIntOption).getOrElse(8383),
      host = env.getOrElse("RS_HOST", "0.0.0.0"),
      basePath = env.getOrElse("RS_API_BASE_PATH", ""),
      ssl = ssl,
      env = env)
    val port = api.start()
    // zenoh (RS_ZENOH_ENABLED, api/zenoh.rs): the full bridge — config,
    // credentials, keyexpr routing, batching, limits — is implemented
    // and TCK-certified (stream/ZenohBridge.scala), but the native
    // protocol binding cannot link in this environment; a deployment
    // with the binding constructs ZenohBridge with its Transport and
    // calls start(). Surface the gap loudly instead of pretending.
    if (graft.stream.Zenoh.Config.fromEnv(env).enabled)
      System.err.println("[zenoh] RS_ZENOH_ENABLED is set: supply a " +
        "native Zenoh Transport to graft.stream.ZenohBridge — see its " +
        "scaladoc; the server continues without the bridge")
    println(s"graft ${HttpApi.ServerVersion} serving on " +
      s"${env.getOrElse("RS_HOST", "0.0.0.0")}:$port " +
      s"(data: $dataPath${if (replica) ", role: replica" else ""})")
    val done = new java.util.concurrent.CountDownLatch(1)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try api.stop() finally store.close()
      done.countDown()
    }, "graft-shutdown"))
    done.await() // serve until SIGTERM/SIGINT
  }
}
