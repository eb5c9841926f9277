package graft.queries

/** Scratch area for sink round-trip queries. Lives under the repo target dir (the only
  * writable area besides the driver-provided outDir). */
object Sinks {
  lazy val scratchDir: String = {
    val d = sys.env.getOrElse("GRAFT_SCRATCH", "/root/repo/target/scratch")
    new java.io.File(d).mkdirs()
    d
  }
}
