package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession

/** Deployable daemon entry point with pluggable file configuration — the
  * reference's own deployment wishes (`/root/reference/TODO.md:2-3`: a
  * `bin` directory with setup/run executables, pluggable config instead
  * of constants edited in source) realized Spark-side: ONE properties
  * file fully describes an engine deployment, and
  * `spark-submit --class graft.Main graft.jar engine.properties` starts
  * the poll daemon on any cluster manager (`bin/graft-run` wraps the
  * local form; `bin/graft-setup` scaffolds a deployment directory).
  *
  * Session policy: an already-running session (tests, programmatic
  * embedding) is adopted as-is; otherwise [[Sessions.adopt]] builds one
  * honoring any submitted `spark.master` (so `--master yarn|k8s` stays
  * a cluster launch) and sizing local fallbacks from the machine's
  * actual cores, under the SAME shared confs as Bench/Verify.
  */
object Main {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.Main <engine.properties> [run|poll-once]")
    val loaded = EngineProperties.load(Paths.get(args(0)))
    val spark = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(Sessions.adopt(sys.env.get("SPARK_GRAFT_CPUS")))
    val engine = Engine.start(spark, loaded.config)
    try args.lift(1).getOrElse("run") match {
      case "poll-once" => engine.pollOnce()
      case "run" => engine.run(loaded.pollMillis, loaded.maxCycles)
      case other => throw new IllegalArgumentException(
        s"unknown mode '$other' (expected run | poll-once)")
    } finally engine.close()
  }
}

/** Properties-file form of [[EngineConfig]]. Every deployment-varying
  * value the reference hardcodes (document folder, control-sheet name,
  * output dataset, poll cadence) is a key here; missing required keys
  * fail together in one message rather than one NPE at a time.
  *
  * RELATIVE paths in the file resolve against the PROPERTIES FILE's own
  * directory, not the process cwd: graft-setup writes paths verbatim
  * from whatever form the deploy dir was named in, and the launcher
  * (bin/graft-run, spark-submit from an arbitrary directory, a
  * container entrypoint) owns the cwd — config-relative is the only
  * resolution that survives all of them. */
object EngineProperties {

  final case class Loaded(config: EngineConfig, pollMillis: Long,
      maxCycles: Option[Int])

  val Required: Seq[String] =
    Seq("graft.sourceRoot", "graft.controlPath", "graft.runLogPath",
      "graft.csvOutDir")

  def load(path: Path): Loaded = {
    require(Files.isReadable(path), s"config not readable: $path")
    val p = new java.util.Properties()
    val in = Files.newInputStream(path)
    try p.load(in) finally in.close()
    def get(k: String): Option[String] =
      Option(p.getProperty(k)).map(_.trim).filter(_.nonEmpty)
    val missing = Required.filter(get(_).isEmpty)
    require(missing.isEmpty,
      s"missing required config keys in $path: ${missing.mkString(", ")}")
    val base = path.toAbsolutePath.getParent
    def resolve(p: String): Path = base.resolve(p).normalize()
    val config = EngineConfig(
      sourceRoot = resolve(get("graft.sourceRoot").get),
      controlPath = resolve(get("graft.controlPath").get),
      runLogPath = resolve(get("graft.runLogPath").get),
      csvOutDir = resolve(get("graft.csvOutDir").get).toString,
      identity = get("graft.identity").getOrElse("graft-engine"),
      maxConcurrentJobs = get("graft.maxConcurrentJobs").map(_.toInt).getOrElse(1))
    require(config.maxConcurrentJobs >= 1,
      s"graft.maxConcurrentJobs must be >= 1 (got ${config.maxConcurrentJobs})")
    Loaded(config,
      pollMillis = get("graft.pollMillis").map(_.toLong).getOrElse(1000L),
      maxCycles = get("graft.maxCycles").map(_.toInt))
  }
}
