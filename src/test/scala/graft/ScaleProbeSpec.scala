package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe artifact machinery: band evidence gathering,
  * self-seeding hull construction, widen warnings, and the per-subset
  * narrowed-run filenames. These guard committed evidence
  * (SCALE_PROBE.json's graph_ktruss band), so the branches a normal
  * probe run rarely exercises — seeding, cross-file merging, malformed
  * shapes, long subsets — are pinned here.
  */
class ScaleProbeSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def entry(json: String) = mapper.readTree(json)

  // -------------------------------------------------------- evidence

  test("evidencePoints yields the headline value plus band endpoints") {
    val e = entry(
      """{"base":1.0,"scaled":30.7,"ratio":4.6,
         "band":{"scaled":[23.0,71.5],"ratio":[4.1,10.4],"note":"n"}}""")
    assert(ScaleProbe.evidencePoints(e, "scaled") == Seq(30.7, 23.0, 71.5))
    assert(ScaleProbe.evidencePoints(e, "ratio") == Seq(4.6, 4.1, 10.4))
  }

  test("evidencePoints ignores absent and malformed fields") {
    val e = entry(
      """{"scaled":"oops","band":{"scaled":[1.0,2.0,3.0]}}""")
    assert(ScaleProbe.evidencePoints(e, "scaled").isEmpty)
    assert(ScaleProbe.evidencePoints(e, "ratio").isEmpty)
    assert(ScaleProbe.evidencePoints(entry("{}"), "scaled").isEmpty)
  }

  // ---------------------------------------------------- bandFragment

  test("bandFragment returns no band without prior evidence") {
    assert(ScaleProbe.bandFragment(Nil, 30.7, 4.6, _ => fail()) == "")
  }

  test("bandFragment self-seeds a band from one prior headline") {
    // first refresh after a bare entry: band = hull(old headline, new)
    val prior = Seq(entry("""{"base":1.0,"scaled":20.0,"ratio":4.0}"""))
    val frag = ScaleProbe.bandFragment(prior, 30.7, 4.6,
      m => fail(s"no prior band, nothing to widen: $m"))
    val b = mapper.readTree(frag.stripPrefix(""","band":"""))
    assert(mapper.writeValueAsString(b.get("scaled")) == "[20.0,30.7]")
    assert(mapper.writeValueAsString(b.get("ratio")) == "[4.0,4.6]")
  }

  test("bandFragment hulls across files and keeps the first note") {
    val outFileEntry = entry(
      """{"scaled":30.0,"ratio":4.5,
         "band":{"scaled":[23.0,71.5],"ratio":[4.1,10.4],"note":"keep"}}""")
    val onlyFileEntry = entry(
      // an isolated rerun BELOW the committed band: must widen the hull
      """{"scaled":19.5,"ratio":3.9,
         "band":{"scaled":[19.5,21.0],"note":"only-run note"}}""")
    var warned = List.empty[String]
    val frag = ScaleProbe.bandFragment(Seq(outFileEntry, onlyFileEntry),
      30.7, 4.6, w => warned ::= w)
    val b = mapper.readTree(frag.stripPrefix(""","band":"""))
    assert(mapper.writeValueAsString(b.get("scaled")) == "[19.5,71.5]")
    assert(mapper.writeValueAsString(b.get("ratio")) == "[3.9,10.4]")
    assert(b.get("note").asText() == "keep",
      "the output file's own curated note must win")
    assert(warned.exists(_.contains("scaled")),
      "widening past the recorded band must warn so the note is re-curated")
  }

  test("bandFragment stays silent when the hull matches the old band") {
    val prior = Seq(entry(
      """{"scaled":30.0,"ratio":4.5,
         "band":{"scaled":[23.0,71.5],"ratio":[4.1,10.4]}}"""))
    val frag = ScaleProbe.bandFragment(prior, 30.7, 4.6,
      m => fail(s"in-band measurement must not warn: $m"))
    val b = mapper.readTree(frag.stripPrefix(""","band":"""))
    assert(mapper.writeValueAsString(b.get("scaled")) == "[23.0,71.5]")
  }

  test("bandFragment floors/ceils hull endpoints so bands never shrink") {
    val prior = Seq(entry("""{"scaled":1.2345,"ratio":2.6789}"""))
    val frag = ScaleProbe.bandFragment(prior, 1.5, 2.5, _ => ())
    val b = mapper.readTree(frag.stripPrefix(""","band":"""))
    // lo floors (1.2345 -> 1.234), hi ceils (2.6789 -> 2.679): every
    // evidence point stays inside the recorded 3dp band
    assert(mapper.writeValueAsString(b.get("scaled")) == "[1.234,1.5]")
    assert(mapper.writeValueAsString(b.get("ratio")) == "[2.5,2.679]")
  }

  // -------------------------------------------- priorArtifactEntries

  test("priorArtifactEntries merges the full artifact and ONLY files, " +
    "output file first") {
    val dir = java.nio.file.Files.createTempDirectory("probe_spec")
    def write(name: String, body: String): Unit =
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    write("SCALE_PROBE.json",
      """{"queries":{"q1":{"scaled":10.0},"q2":{"scaled":5.0}}}""")
    write("SCALE_PROBE_ONLY_q1.json",
      """{"queries":{"q1":{"scaled":12.0}}}""")
    write("SCALE_PROBE_HUB_ONLY_q1.json", // other mode: must not leak in
      """{"queries":{"q1":{"scaled":99.0}}}""")
    write("SCALE_PROBE_bogus.txt", "not json") // non-matching name
    val m = ScaleProbe.priorArtifactEntries(
      "SCALE_PROBE.json", "SCALE_PROBE", dir.toString)
    assert(m.keySet == Set("q1", "q2"))
    assert(m("q1").map(_.get("scaled").asDouble()) == Seq(10.0, 12.0))
    assert(m("q2").map(_.get("scaled").asDouble()) == Seq(5.0))
  }

  test("priorArtifactEntries rejects evidence from a different mult or src") {
    val dir = java.nio.file.Files.createTempDirectory("probe_spec_ms")
    def write(name: String, body: String): Unit =
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    write("SCALE_PROBE.json",
      """{"mult":10,"src":"/data/sf0.1",
         "queries":{"q1":{"scaled":10.0}}}""")
    // a quick SPARK_GRAFT_SCALE=3 debug run: its ratios are ~mult/3 —
    // hulling them would corrupt the committed 10x band floor forever
    write("SCALE_PROBE_ONLY_q1.json",
      """{"mult":3,"src":"/data/sf0.1","queries":{"q1":{"scaled":3.0}}}""")
    // same mult against a different source corpus: also not evidence
    write("SCALE_PROBE_ONLY_q2.json",
      """{"mult":10,"src":"/data/sf0.01","queries":{"q1":{"scaled":1.0}}}""")
    val m = ScaleProbe.priorArtifactEntries("SCALE_PROBE.json",
      "SCALE_PROBE", dir.toString, Some(10), Some("/data/sf0.1"))
    assert(m("q1").map(_.get("scaled").asDouble()) == Seq(10.0))
    // no filter requested (legacy callers/tests): everything merges
    val all = ScaleProbe.priorArtifactEntries("SCALE_PROBE.json",
      "SCALE_PROBE", dir.toString)
    assert(all("q1").size == 3)
  }

  test("priorArtifactEntries skips unreadable or malformed files") {
    val dir = java.nio.file.Files.createTempDirectory("probe_spec2")
    java.nio.file.Files.write(dir.resolve("SCALE_PROBE.json"),
      "{broken".getBytes("UTF-8"))
    assert(ScaleProbe.priorArtifactEntries(
      "SCALE_PROBE.json", "SCALE_PROBE", dir.toString).isEmpty)
    // no files at all: first-ever run
    val empty = java.nio.file.Files.createTempDirectory("probe_spec3")
    assert(ScaleProbe.priorArtifactEntries(
      "SCALE_PROBE.json", "SCALE_PROBE", empty.toString).isEmpty)
  }

  // ------------------------------------------------- onlyFileSuffix

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
