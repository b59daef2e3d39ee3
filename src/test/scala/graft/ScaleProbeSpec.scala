package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe artifact machinery: band carry/widen semantics and
  * the per-subset narrowed-run filenames. These guard committed
  * evidence (SCALE_PROBE.json's graph_ktruss band), so the branches a
  * normal probe run rarely exercises — widening, malformed shapes,
  * long subsets — are pinned here.
  */
class ScaleProbeSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def band(json: String) = mapper.readTree(json)

  test("widenBand leaves a measurement inside the band untouched") {
    val b = band("""{"scaled":[23.0,71.5],"ratio":[4.1,10.4],"note":"n"}""")
    ScaleProbe.widenBand(b, "scaled", 30.7)
    assert(mapper.writeValueAsString(b.get("scaled")) == "[23.0,71.5]")
    assert(b.get("note").asText() == "n")
  }

  test("widenBand widens the low end, the high end, and keeps the note") {
    val b = band("""{"scaled":[23.0,71.5],"note":"evidence"}""")
    ScaleProbe.widenBand(b, "scaled", 80.2)
    assert(mapper.writeValueAsString(b.get("scaled")) == "[23.0,80.2]")
    ScaleProbe.widenBand(b, "scaled", 19.5)
    assert(mapper.writeValueAsString(b.get("scaled")) == "[19.5,80.2]")
    assert(b.get("note").asText() == "evidence")
  }

  test("widenBand ignores absent or malformed band fields") {
    val b = band("""{"scaled":"not-an-array","ratio":[1.0,2.0,3.0]}""")
    ScaleProbe.widenBand(b, "scaled", 99.0) // non-array: untouched
    ScaleProbe.widenBand(b, "ratio", 99.0) // 3 elements: untouched
    ScaleProbe.widenBand(b, "missing", 99.0) // absent: no throw
    assert(b.get("scaled").asText() == "not-an-array")
    assert(mapper.writeValueAsString(b.get("ratio")) == "[1.0,2.0,3.0]")
  }

  test("onlyFileSuffix is order-insensitive and readable for short subsets") {
    assert(ScaleProbe.onlyFileSuffix(Seq("graph_ktruss")) ==
      "_ONLY_graph_ktruss")
    assert(ScaleProbe.onlyFileSuffix(Seq("b_q", "a_q")) ==
      ScaleProbe.onlyFileSuffix(Seq("a_q", "b_q")))
    assert(ScaleProbe.onlyFileSuffix(Seq("a_q", "b_q")) == "_ONLY_a_q_b_q")
  }

  test("onlyFileSuffix hashes long subsets into a bounded, stable name") {
    val many = (1 to 30).map(i => s"query_number_$i")
    val s1 = ScaleProbe.onlyFileSuffix(many)
    val s2 = ScaleProbe.onlyFileSuffix(scala.util.Random.shuffle(many))
    assert(s1 == s2, "same subset must map to the same file")
    assert(s1.length <= "_ONLY_".length + 53 + 9)
    val other = ScaleProbe.onlyFileSuffix(many :+ "one_more")
    assert(s1 != other, "different subsets must not collide")
  }
}
