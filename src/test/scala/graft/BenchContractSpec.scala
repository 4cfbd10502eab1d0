package graft

import org.scalatest.funsuite.AnyFunSuite

/** Compile-and-test-time gates on the bench stdout contract, so a new
  * declared query that would collide after key abbreviation or push
  * the JSON line past the harness's output tail fails at `sbt test`
  * rather than inside a scored bench run. */
class BenchContractSpec extends AnyFunSuite {

  test("abbreviated bench keys are unique over the declared query set") {
    val names = SparkEntry.queries.keys.toSeq
    val short = names.map(Bench.shortKey)
    val dups = short.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"colliding abbreviated keys: ${dups.mkString(",")}")
  }

  test("per-query map auto-fits its budget: full map or slowest + rollup") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case values (5 chars each): the composed map must fit the
    // budget BY CONSTRUCTION, with the slowest entries surviving
    val worst = names.map(n => n -> 99.99)
    val qs = Bench.composeQueries(worst, Bench.QueriesBudget)
    info(s"composed worst-case map: ${qs.length} chars " +
      s"(budget ${Bench.QueriesBudget}, ${names.size} queries, " +
      s"rollup=${qs.contains("\"oth\":")})")
    assert(qs.length <= Bench.QueriesBudget)
    // generous budget -> complete map, no rollup
    val full = Bench.composeQueries(worst, 1000000)
    assert(!full.contains("\"oth\":"))
    names.foreach(n => assert(
      full.contains("\"" + Bench.shortKey(n) + "\":"),
      s"$n missing from the full map"))
    // tight budget -> the SLOWEST queries survive and the rollup
    // accounts for every dropped one
    val varied = names.zipWithIndex.map { case (n, i) => n -> (i + 1).toDouble }
    val trunc = Bench.composeQueries(varied, 400)
    assert(trunc.length <= 400 && trunc.contains("\"oth\":{\"n\":"))
    varied.sortBy(-_._2).take(5).foreach { case (n, _) =>
      assert(trunc.contains("\"" + Bench.shortKey(n) + "\":"),
        s"slowest query $n dropped from the truncated map")
    }
    val othN = "\"oth\":\\{\"n\":(\\d+)".r
      .findFirstMatchIn(trunc).get.group(1).toInt
    val kept = names.count(n => trunc.contains("\"" + Bench.shortKey(n) + "\":"))
    assert(kept + othN == names.size,
      s"rollup count $othN + kept $kept != ${names.size}")
  }

  test("deadline degrade path: phase decisions against a fake clock") {
    var t = 0.0
    val dl = new Bench.BenchDeadline(1000.0, () => t)
    // warm-up is best-effort: continues early, stops past 25%
    assert(dl.continueWarmup)
    t = 251; assert(!dl.continueWarmup)
    // the first interleaved pass needs 60% headroom
    t = 500; assert(dl.startPass(None))
    t = 601; assert(!dl.startPass(None))
    // a later pass starts only if the previous pass's cost fits
    // before 92% of budget
    t = 600; assert(dl.startPass(Some(300.0)))
    assert(!dl.startPass(Some(321.0)))
    // prime + in-flight passes abort only at 97%
    t = 969; assert(dl.continuePass && dl.continuePrime)
    t = 971; assert(!dl.continuePass && !dl.continuePrime)
    // the re-measure phase runs only if its estimate fits before 95%
    t = 900; assert(dl.allowRemeasure(49.0))
    assert(!dl.allowRemeasure(51.0))
  }

  test("degraded field pays for itself out of the per-query budget") {
    // worst case the main loop can produce: 8 flags survive the cap,
    // longest spelling ~"pass3_aborted"; the composed map shrinks by
    // the field's length so line length is bounded by construction
    val worstFlags = Seq("warmup", "prime", "pass1_aborted", "runs=0",
      "fallback=273", "norem", "pass2_aborted", "pass3_aborted")
    val field = s""","degraded":"${worstFlags.take(8).mkString(",")}""""
    val names = SparkEntry.queries.keys.toSeq.sorted
    val qs = Bench.composeQueries(names.map(_ -> 99.99),
      Bench.QueriesBudget - field.length - 16)
    assert(qs.length + field.length + 16 <= Bench.QueriesBudget)
  }

  test("remeasured keys ride the stdout line, capped, inside the " +
      "line budget") {
    assert(Bench.composeRemeasured(Nil) == "[]")
    assert(Bench.composeRemeasured(Seq("ab", "cub")) == """["ab","cub"]""")
    // cap: pathological ambient load (everything remeasured) cannot
    // blow the line — at most 24 entries surface
    val many = (1 to 100).map(i => s"k$i")
    val capped = Bench.composeRemeasured(many)
    assert(capped.count(_ == ',') == 23, capped)
    // worst-case line math: the per-query map shrinks by what the
    // remeasured field costs, so map + field stay under QueriesBudget
    val names = SparkEntry.queries.keys.toSeq.sorted
    val worstRem = Bench.composeRemeasured(
      names.map(Bench.shortKey).sorted)
    val qs = Bench.composeQueries(names.map(_ -> 99.99),
      Bench.QueriesBudget - worstRem.length - 16)
    assert(qs.length + worstRem.length + 16 <= Bench.QueriesBudget,
      s"${qs.length} + ${worstRem.length} must fit the budget")
  }
}
