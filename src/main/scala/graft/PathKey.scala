package graft

/** Filesystem-safe key for a data-directory path, used to name
  * per-corpus materializations (stem dicts, materialized stars).
  *
  * The sanitized form alone is ambiguous — `data/sf0.1`, `data/sf0_1`
  * and `data_sf0-1` all collapse to the same `data_sf0_1`, so one
  * corpus's materialization could be served for another (ADVICE r15
  * #4: the exact clobber class the per-corpus keying exists to
  * prevent). A short hash of the RAW path disambiguates; the readable
  * prefix is kept for debuggability. String.hashCode is specified by
  * the JLS, so the key is stable across JVMs and rounds.
  */
object PathKey {
  def apply(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.lang.Integer.toHexString(dir.hashCode)
}
