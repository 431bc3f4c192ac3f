package graft

/** Interval-string parsing shared by the state kernels (`:withRetention`,
  * session gaps, near-dup bucket retention): the `"N unit"` subset of
  * Spark's interval syntax that `withWatermark` accepts.
  */
private[graft] object Intervals {
  def toMillis(interval: String): Long = {
    val parts = interval.trim.split("\\s+")
    require(parts.length == 2,
      s"interval must be 'N unit' (e.g. '10 minutes'): '$interval'")
    val base = parts(1).toLowerCase.stripSuffix("s") match {
      case "millisecond" => 1L
      case "second" => 1000L
      case "minute" => 60000L
      case "hour" => 3600000L
      case "day" => 86400000L
      case u => throw new IllegalArgumentException(s"unsupported interval unit $u")
    }
    parts(0).toLong * base
  }
}
