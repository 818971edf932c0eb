package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line is the driver's only perf artifact — two rounds
  * lost their parse to formatting accidents, so the format is pinned by
  * test: must parse as JSON (Jackson, from Spark's classpath) with the
  * exact contract fields, including edge values Scala prints oddly.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("bench line parses as JSON with the contract fields") {
    val line = Bench.formatLine(
      Seq("q_a" -> 0.123456789, "q_b" -> 12.0, "q_c" -> 1.0e-4),
      Seq("q_bad"), "/root/testdata/sf0.1", partial = false)
    val n = mapper.readTree(line)
    assert(n.get("metric").asText == "total")
    assert(n.get("unit").asText == "sec")
    // the total renders at 2dp, summed at full precision before rounding
    assert(math.abs(n.get("value").asDouble - 12.12) < 1e-9)
    assert(n.get("queries").size == 3)
    // stdout per-query values render at 1dp (tail-window budget; see fmt)
    assert(math.abs(n.get("queries").get("q_a").asDouble - 0.1) < 1e-12)
    assert(math.abs(n.get("queries").get("q_b").asDouble - 12.0) < 1e-12)
    assert(n.get("queries").get("q_c").asDouble == 0.0) // sub-ms floors to "0"
    assert(n.get("queries_median") == null) // sidecar-only field
    assert(n.get("partial") == null) // only rendered when true
    assert(n.get("failed").get(0).asText == "q_bad")
  }

  test("sidecar rendering carries 2dp values and per-query medians") {
    val line = Bench.formatLine(
      Seq("q_a" -> 0.123456789, "q_b" -> 1.0),
      Nil, "sf", partial = false, dp = 2,
      medians = Some(Map("q_a" -> 0.256789, "q_b" -> 1.5)))
    val n = mapper.readTree(line)
    assert(math.abs(n.get("queries").get("q_a").asDouble - 0.12) < 1e-12)
    val med = n.get("queries_median")
    assert(med.size == 2)
    assert(math.abs(med.get("q_a").asDouble - 0.26) < 1e-12)
    assert(math.abs(med.get("q_b").asDouble - 1.5) < 1e-12)
  }

  test("partial flag and failure list render only when informative") {
    val line = Bench.formatLine(Seq("q" -> 1.5), Nil, "sf", partial = true)
    val n = mapper.readTree(line)
    assert(n.get("partial").asBoolean)
    assert(n.get("failed") == null) // empty list omitted
    val happy = mapper.readTree(
      Bench.formatLine(Seq("q" -> 1.5), Nil, "sf", partial = false))
    assert(happy.get("partial") == null && happy.get("failed") == null)
  }

  test("a full-size query roster fits the driver's 2000-char tail window") {
    // The driver keeps only the LAST 2000 chars of the run log. The JSON
    // line itself is UNPREFIXED (run/outputStrategy := StdoutOutput); the
    // only other tail occupant is sbt's "[success] Total time ..." line,
    // measured at 72 chars. Budget = 2000 − 72 − 2 newlines − 15 suffix
    // variance (duration formatting: "58 s" vs "683 s (11:23)") − 15
    // slack ≈ 1895 guard against a ~1925 usable window. (r6
    // recalibration: the earlier ~1910 guess double-counted an "[info] "
    // prefix the bare line doesn't carry.) Values here are full-width
    // 1dp seconds ("1.2" — no trailing-zero trimming applies), the
    // worst case: per-query times above 10s mean the bench is broken
    // anyway. The roster is the BENCH roster (golden companions are
    // never timed); the stdout emit passes the sf BASENAME. If this
    // fires, the roster has outgrown the format — trim the FORMAT
    // (shorter keys need a documented rename) — never raise the guard
    // past the measured budget.
    val roster = Bench.benchQueryNames.map(_ -> 1.234567)
    val line = Bench.formatLine(roster, Nil, "sf0.1", partial = false)
    assert(mapper.readTree(line).get("queries").size == roster.size)
    assert(line.length <= 1895,
      s"bench line ${line.length} chars — headroom to the measured ~1925 budget: ${1925 - line.length}; time to trim the format")
  }
}
