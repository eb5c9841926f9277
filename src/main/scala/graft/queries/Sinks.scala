package graft.queries

/** Scratch area for sink round-trip queries. Lives under the repo target dir (the only
  * writable area besides the driver-provided outDir). */
object Sinks {
  lazy val scratchDir: String = {
    val d = sys.env.getOrElse("GRAFT_SCRATCH", "/root/repo/target/scratch")
    new java.io.File(d).mkdirs()
    d
  }

  /** Scratch path for a fixture DERIVED FROM `dir`'s tables. The sf-dir hash keys the
    * cache so runs against different scale factors never share a stale fixture (an
    * exists-guard alone would reuse sf0.01-built data in an sf0.001 run). */
  def scoped(dir: String, name: String): String = {
    val suffix = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir) & 0x7fffffff)
    s"$scratchDir/${name}_$suffix"
  }
}
