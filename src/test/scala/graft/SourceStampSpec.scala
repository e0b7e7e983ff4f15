package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-record provenance stamp's contract (VERDICT r13 #1):
  * the stamp is SOURCE-CONTENT-granular — a doc/test/artifact edit
  * leaves it unchanged, any `src/main` or `build.sbt` edit changes it —
  * so doc-only commits can never again stale-ify a quiet bench record
  * over byte-identical measured code (the round-13 displacement, three
  * occurrences). */
class SourceStampSpec extends AnyFunSuite {

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
    ()
  }

  private def fixture(): Path = {
    val root = Files.createTempDirectory("stampspec")
    write(root, "src/main/scala/graft/A.scala", "object A { val x = 1 }\n")
    write(root, "src/main/scala/graft/sub/B.scala", "object B\n")
    write(root, "build.sbt", "name := \"t\"\n")
    write(root, "README.md", "docs v1\n")
    write(root, "src/test/scala/graft/ASpec.scala", "class ASpec\n")
    root
  }

  test("stamp is deterministic, 12 lowercase hex chars") {
    val root = fixture()
    val s1 = Bench.sourceStamp(root)
    val s2 = Bench.sourceStamp(root)
    assert(s1 == s2)
    assert(s1.matches("[0-9a-f]{12}"), s"not a 12-hex stamp: $s1")
  }

  test("doc-only and test-only edits do NOT change the stamp") {
    val root = fixture()
    val s1 = Bench.sourceStamp(root)
    write(root, "README.md", "docs v2 — a doc-only commit\n")
    write(root, "VERDICT.md", "a new round artifact\n")
    write(root, "src/test/scala/graft/ASpec.scala", "class ASpec { }\n")
    assert(Bench.sourceStamp(root) == s1,
      "a doc/test edit changed the source stamp — doc-only commits would stale-ify quiet records again")
  }

  test("src/main content, path, and build.sbt edits each change the stamp") {
    val root = fixture()
    val s1 = Bench.sourceStamp(root)
    write(root, "src/main/scala/graft/A.scala", "object A { val x = 2 }\n")
    val s2 = Bench.sourceStamp(root)
    assert(s2 != s1, "a source edit must produce a new stamp")
    // a path-only change (same bytes under a new name) is a source change too
    Files.move(root.resolve("src/main/scala/graft/sub/B.scala"),
      root.resolve("src/main/scala/graft/sub/B2.scala"))
    val s3 = Bench.sourceStamp(root)
    assert(s3 != s2)
    write(root, "build.sbt", "name := \"t2\"\n")
    assert(Bench.sourceStamp(root) != s3, "a build.sbt edit must produce a new stamp")
  }

  test("a root without src/main stamps 'unknown' (never a defendable value)") {
    val root = Files.createTempDirectory("stampspec-empty")
    write(root, "build.sbt", "name := \"t\"\n")
    assert(Bench.sourceStamp(root) == "unknown")
  }

  test("the real repo stamps a stable hex value") {
    val here = java.nio.file.Paths.get(".")
    val s = Bench.sourceStamp(here)
    assert(s.matches("[0-9a-f]{12}"))
    assert(Bench.sourceStamp(here) == s)
  }
}
