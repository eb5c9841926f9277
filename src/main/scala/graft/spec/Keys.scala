package graft.spec

/** Key normalization + fuzzy lookup semantics (reference utils/dicts.py):
  *  - manifest root keys → snake_case (`my-key` → `my_key`, dicts.py:5-11)
  *  - env keys → POSIX upper-snake (`base-url` → `BASE_URL`, dicts.py:14-27)
  *  - lookups are case-insensitive with `-`/`_` interchangeable (dicts.py:30-40)
  */
object Keys {
  def snake(k: String): String = k.replace('-', '_').toLowerCase

  def envKey(k: String): String = k.replace('-', '_').toUpperCase

  private def canon(k: String): String = k.replace('-', '_').toLowerCase

  /** Case-insensitive, -/_-interchangeable lookup. Ambiguity rule (fidelity,
    * dicts.py:37): the reference rebuilds `{conform_key(k): v}` as a dict
    * comprehension, so when two keys normalize to the same canonical form the
    * LAST one in iteration order wins — there is no exact-spelling preference.
    * (Our conformed maps are VectorMaps, so iteration order = declaration
    * order, matching Python's insertion-ordered dicts.) */
  def fuzzyGet[V](m: scala.collection.Map[String, V], key: String): Option[V] = {
    val c = canon(key)
    var res: Option[V] = None
    m.foreach { case (k, v) => if (canon(k) == c) res = Some(v) }
    res
  }

  // Conforming preserves insertion order (VectorMap): the resolver is
  // single-pass in declaration order (reference dicts are ordered;
  // test_job.py:471-501 pins the observable consequences).
  def conformRoot(m: Map[String, Any]): Map[String, Any] =
    scala.collection.immutable.VectorMap.from(
      m.iterator.map { case (k, v) => snake(k) -> v })
  def conformEnv(m: Map[String, Any]): Map[String, Any] =
    scala.collection.immutable.VectorMap.from(
      m.iterator.map { case (k, v) => envKey(k) -> v })
}
