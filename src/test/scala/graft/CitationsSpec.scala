package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every reference citation in `src/main` scaladoc must resolve to a
  * real file in /root/reference — the r8 verdict found a fabricated
  * anchor ("etl/content_quality_rules.py", no such file), and
  * SURVEY/COVERAGE credibility rests on every file:line being real.
  * This is the tools-check the verdict prescribed, as a spec so it
  * can't rot. */
class CitationsSpec extends AnyFunSuite {
  import scala.jdk.CollectionConverters._
  import java.nio.file.{Files, Paths}

  private val refRoot = Paths.get("/root/reference")

  // our own repo docs + build files legitimately named in comments
  private val ownDocs = Set(
    "SURVEY.md", "COVERAGE.md", "BASELINE.md", "README.md", "TESTDATA.md",
    "VERDICT.md", "ADVICE.md", "PAPERS.md", "SNIPPETS.md", "FIXTURES.md",
    "BENCH_r07.json", "bench_history.jsonl", "oracle_sql.json")

  test("every cited reference file exists somewhere under /root/reference") {
    assume(Files.isDirectory(refRoot), "reference checkout not present")
    val refNames = Files.walk(refRoot).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(_.getFileName.toString).toSet
    val srcFiles = Files.walk(Paths.get("src/main/scala/graft")).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toList
    // a citation is a snake/kebab-named file with a reference-repo
    // extension, optionally path-prefixed; Java/Scala package names
    // (org.apache.spark.sql) have neither _ nor - in any segment and
    // never match
    val citeRe = """[A-Za-z0-9_\-]*[_\-][A-Za-z0-9_\-]*\.(?:py|sql|conf|yml|yaml|md)|[a-z0-9_\-]+(?:/[a-z0-9_.\-]+)+\.(?:py|sql|conf|yml|yaml|md)""".r
    val bad = for {
      p <- srcFiles
      src = new String(Files.readAllBytes(p), "UTF-8")
      name <- citeRe.findAllIn(src).toSeq.distinct
      base = name.split('/').last
      if !ownDocs.contains(base)
      if !refNames.contains(base)
    } yield s"${p.getFileName}: $name"
    assert(bad.isEmpty,
      s"citations that resolve to NO file in /root/reference (${bad.size}):\n  ${bad.sorted.mkString("\n  ")}")
  }

  test("every cited reference LINE RANGE fits inside the cited file") {
    assume(Files.isDirectory(refRoot), "reference checkout not present")
    // length of every reference file by basename (unique enough: on
    // collision keep the LONGEST — a cite within the shorter twin
    // still fits)
    val refLen = Files.walk(refRoot).iterator().asScala
      .filter(Files.isRegularFile(_))
      .toList.groupBy(_.getFileName.toString)
      .map { case (n, ps) =>
        // byte-wise newline count: reference may hold non-UTF-8 files
        n -> ps.map(p => Files.readAllBytes(p).count(_ == '\n') + 1).max }
    val srcFiles = Files.walk(Paths.get("src/main/scala/graft")).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toList
    val lineCiteRe = """([A-Za-z0-9_\-]*[_\-][A-Za-z0-9_\-]*\.(?:py|sql|conf|yml|yaml|md)):(\d+)(?:-(\d+))?""".r
    val bad = for {
      p <- srcFiles
      src = new String(Files.readAllBytes(p), "UTF-8")
      m <- lineCiteRe.findAllMatchIn(src).toSeq
      base = m.group(1).split('/').last
      if !ownDocs.contains(base)
      len <- refLen.get(base).toSeq
      hi = Option(m.group(3)).getOrElse(m.group(2)).toInt
      if hi > len
    } yield s"${p.getFileName}: ${m.matched} (file has $len lines)"
    assert(bad.isEmpty,
      s"citations pointing past the end of their reference file (${bad.size}):\n  ${bad.sorted.mkString("\n  ")}")
  }
}
