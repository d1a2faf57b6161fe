package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/**
 * Style gate, mirroring the reference plugin's build-time scalastyle check
 * (reference `pom.xml:160-183` + `scalastyle-config.xml`). The sbt plugin
 * ecosystem is unavailable offline, so the same core file-level rules run
 * here as a plain test: the gate is `sbt test`, exactly like the
 * reference's `mvn package`.
 *
 * Enforced (reference check in parens): no tab characters
 * (FileTabChecker), no trailing whitespace (WhitespaceEndOfLineChecker),
 * line length <= 120 (FileLineLengthChecker, widened from 100 for
 * embedded SQL), newline at EOF (NewLineAtEofChecker), no
 * `NotImplementedError` placeholders (NotImplementedErrorUsage), and
 * `println` confined to the CLI mains (RegexChecker on println).
 */
class StyleSuite extends AnyFunSuite {

  private val roots = Seq("src/main/scala", "src/test/scala")

  // the CLI/driver mains and dev tools legitimately print to stdout
  private val printlnAllowed = Set(
    "graft/Bench.scala", "graft/Verify.scala", "graft/tools/Explain.scala",
    "graft/tools/Profile.scala")

  private def sources: Seq[Path] = roots.flatMap { r =>
    val root = Paths.get(r)
    if (!Files.exists(root)) Nil
    else Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
  }

  private def check(rule: String)(violation: (Path, Array[String]) => Seq[String]): Unit =
    test(rule) {
      val all = sources.flatMap { p =>
        val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        violation(p, text.split("\n", -1))
      }
      assert(all.isEmpty, s"\n${all.mkString("\n")}")
    }

  check("no tab characters") { (p, lines) =>
    lines.zipWithIndex.collect {
      case (l, i) if l.contains('\t') => s"$p:${i + 1}: tab character"
    }
  }

  check("no trailing whitespace") { (p, lines) =>
    lines.zipWithIndex.collect {
      case (l, i) if l != l.replaceAll("[ \t]+$", "") =>
        s"$p:${i + 1}: trailing whitespace"
    }
  }

  check("line length <= 120") { (p, lines) =>
    lines.zipWithIndex.collect {
      case (l, i) if l.length > 120 => s"$p:${i + 1}: ${l.length} chars"
    }
  }

  check("newline at end of file") { (p, lines) =>
    // split("\n", -1) leaves one trailing empty element iff the file ends
    // with a newline
    if (lines.isEmpty || lines.last.nonEmpty) Seq(s"$p: no newline at EOF") else Nil
  }

  check("no not-implemented placeholders") { (p, lines) =>
    val needle = "?" * 3 // built dynamically so this file passes its own gate
    lines.zipWithIndex.collect {
      case (l, i) if l.contains(needle) => s"$p:${i + 1}: $needle placeholder"
    }
  }

  check("println only in CLI mains") { (p, lines) =>
    val rel = p.toString.replace('\\', '/')
    if (!rel.startsWith("src/main/scala") ||
      printlnAllowed.exists(rel.endsWith)) Nil
    else lines.zipWithIndex.collect {
      case (l, i) if l.matches(""".*\bprintln\(.*""") => s"$p:${i + 1}: println"
    }
  }
}
