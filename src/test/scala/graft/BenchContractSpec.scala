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

  test("worst-case bench JSON line fits the output tail with margin") {
    // per entry: "key":NN.NN, — key + quotes(2) + colon + up to 5 value
    // chars + comma; fixed fields measured from the emitted template
    val perQuery = SparkEntry.queries.keys.toSeq
      .map(n => Bench.shortKey(n).length + 9).sum
    val fixed = 130 // {"metric":"total",...,"failed":[],"sf":"<path>"}
    val estimate = fixed + perQuery
    info(s"estimated worst-case line: $estimate chars " +
      s"(${SparkEntry.queries.size} queries)")
    // runtime gate is 1800 (see Bench.scala — with StdoutOutput only
    // sbt's ~60-char [success] footer follows the line in the tail)
    assert(estimate < 1800,
      s"estimated bench line $estimate chars would trip the runtime " +
        "1800-char gate — widen the abbreviation map before adding queries")
  }
}
