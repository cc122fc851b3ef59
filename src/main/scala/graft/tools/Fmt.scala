package graft.tools

/** Locale-pinned numeric formatting for the soak tools' attested
  * output: the default-locale `f""`/`.format` would render 70.2 as
  * "70,2" under a comma-decimal locale, corrupting the single-line
  * JSON these tools emit (soak_compare.py json.load) and the
  * per-round stderr traces.
  */
object Fmt {
  def fmt(spec: String, v: Double): String =
    String.format(java.util.Locale.ROOT, spec, Double.box(v))
}
