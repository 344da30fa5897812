package graft

/** The per-query bench floor: best-known min seconds per query,
  * persisted in BENCH_FLOOR.json and updated ONLY downward — the
  * noise-proof regression baseline (a co-tenant-inflated run can
  * never poison a floor, so "this run vs floor" is a diff, not a
  * triage session). Pure functions, unit-tested in BenchFloorSpec;
  * Bench wires them to the file and the artifact JSON.
  */
object BenchFloor {

  /** Regression flag thresholds: > 1.5× the floor AND > 0.3 s over it
    * (sub-second queries jitter multiplicatively without meaning
    * anything). */
  val RatioThreshold = 1.5
  val AbsoluteThresholdSec = 0.3

  /** Parse a flat {"name": seconds, ...} floor file. Tolerant of
    * formatting (regex over pairs); unreadable input → empty. */
  def parse(text: String): Map[String, Double] =
    "\"([^\"]+)\"\\s*:\\s*([0-9][0-9.eE+-]*)".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** Queries of this run flagged as regressed vs their floor. Failed
    * queries (negative time) are never flagged — they are reported in
    * the `failed` list instead; queries without a floor cannot regress
    * (they SET the floor). */
  def regressed(floor: Map[String, Double],
                best: Seq[(String, Double)]): Seq[String] =
    best.collect {
      case (k, v) if v >= 0 && floor.get(k).exists(f =>
        v > f * RatioThreshold && v - f > AbsoluteThresholdSec) => k
    }

  /** The ratcheted floor: min(known floor, this run) per query; new
    * queries enter at this run's min; a query absent from this run
    * (filtered run, failure) keeps its floor. Never raised, never
    * dropped. */
  def merge(floor: Map[String, Double],
            best: Map[String, Double]): Seq[(String, Double)] =
    (floor.keySet ++ best.keySet).toSeq.sorted.flatMap { k =>
      (floor.get(k), best.get(k).filter(_ >= 0)) match {
        case (Some(f), Some(v)) => Some(k -> math.min(f, v))
        case (Some(f), None) => Some(k -> f)
        case (None, Some(v)) => Some(k -> v)
        case _ => None
      }
    }

  /** Render the floor file body (stable order, trailing-comma-free —
    * must round-trip through [[parse]]). */
  def render(entries: Seq[(String, Double)]): String = {
    val body = entries.zipWithIndex.map { case ((k, v), i) =>
      s"""  "$k": ${f"$v%.4f"}${if (i < entries.size - 1) "," else ""}"""
    }.mkString("\n")
    s"{\n$body\n}\n"
  }
}
