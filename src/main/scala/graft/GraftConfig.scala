package graft

/** Engine configuration mirroring the reference's TOML surface
  * (config.toml / x/common/config.go) so a reference operator can carry
  * their knobs over one-to-one. Streaming analogies per SURVEY §2.9:
  * prefetch → maxFilesPerTrigger; the 6 h daemon TTL → ProcessingTime
  * trigger; priorities stay 1-4.
  */
case class GraftConfig(
    /** Image output resolutions (config.toml:21-27; config.go:133-136). */
    resolutions: Seq[(Int, Int)] = Seq((200, 150), (120, 90)),
    /** Metadata refresh cycle (daemon_ttl_seconds, config.toml:46). */
    daemonTtlSeconds: Int = 21600,
    /** Refresh fraction per cycle (daemon_update_percent, config.toml:47). */
    daemonUpdatePercent: Int = 20,
    /** HTTP fetch timeout (service.go:66, resizer.go:50). */
    fetchTimeoutMs: Int = 15000,
    /** Backpressure: prefetch=1 analog (config.toml:19,38,44). */
    maxFilesPerTrigger: Int = 1,
    /** Queue priority ceiling (x-max-priority, config.toml:18,37,43). */
    maxPriority: Int = 10)

object GraftConfig {
  val default: GraftConfig = GraftConfig()

  /** Parse from a flat key→value map (the engine's TOML-file stand-in;
    * unknown keys ignored, missing keys defaulted — viper semantics). */
  def fromMap(m: Map[String, String]): GraftConfig = {
    def int(k: String, d: Int): Int = m.get(k).map(_.trim.toInt).getOrElse(d)
    val res = m.get("resolutions").map { s =>
      s.split(";").toSeq.map { p =>
        val Array(w, h) = p.split("x").map(_.trim.toInt); (w, h)
      }
    }.getOrElse(default.resolutions)
    GraftConfig(
      resolutions = res,
      daemonTtlSeconds = int("daemon_ttl_seconds", default.daemonTtlSeconds),
      daemonUpdatePercent =
        int("daemon_update_percent", default.daemonUpdatePercent),
      fetchTimeoutMs = int("fetch_timeout_ms", default.fetchTimeoutMs),
      maxFilesPerTrigger =
        int("max_files_per_trigger", default.maxFilesPerTrigger),
      maxPriority = int("max_priority", default.maxPriority))
  }
}
