package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the object-val-initialization-order hazard
  * (r11 verdict #6 — it bit twice: r10 q_ivf_pq_filtered filtered on
  * label=0, r11 q_split_date interpolated as the string "null"; both
  * were a constant DECLARED BELOW the SQL val that interpolated it,
  * which Scala silently initializes to null/0).
  *
  * Static source scan, no reflection games: within every production
  * source file, an object-level CONSTANT (non-lazy val with an
  * uppercase-initial name — the repo's constant convention) must be
  * declared BEFORE its first same-file use. Comments are blanked
  * first (scaladoc is full of `$NCells`-style references), preserving
  * offsets so reported line numbers are real. Lazy vals and defs are
  * exempt — they evaluate on demand and cannot capture a default.
  *
  * Two detectors:
  *  - interpolation use (`$Name` / `${Name`) before the declaration —
  *    the exact bite class (SQL strings capturing null/0);
  *  - bare identifier use before the declaration. Names of length ≥ 2
  *    match anywhere; single letters (like K) collide with type
  *    parameters, so they only match at square-bracket depth 0 — in
  *    Scala, `[...]` is (outside array literals, which don't exist)
  *    type application, so a one-letter identifier inside brackets is
  *    a type param and one outside is a value use (r12 advisor: the
  *    earlier blanket skip left a hole for forward refs to `val K`).
  */
class InitOrderSpec extends AnyFunSuite {

  private val SrcRoot = new java.io.File("src/main/scala")

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    kids.filter(_.isFile).filter(_.getName.endsWith(".scala")) ++
      kids.filter(_.isDirectory).flatMap(scalaFiles)
  }

  /** Blank block comments and full-line // comments, preserving every
    * character offset (comments become spaces). Trailing // comments
    * are left alone — '//' is DuckDB integer division inside SQL
    * strings and cannot be distinguished lexically; full-line comments
    * cover the scaladoc/commentary that actually references constants. */
  private def blankComments(src: String): String = {
    val noBlocks = raw"/\*[\s\S]*?\*/".r.replaceAllIn(
      src, m => java.util.regex.Matcher.quoteReplacement(
        m.matched.map(c => if (c == '\n') '\n' else ' ')))
    noBlocks.linesIterator.map { l =>
      if (l.trim.startsWith("//")) " " * l.length else l
    }.mkString("\n")
  }

  // Scope that matters: a forward reference is only a hazard when it
  // sits in the INITIALIZER of an earlier (non-lazy) member val —
  // method bodies and codegen templates evaluate at runtime, after
  // the object is fully initialized, and are exempt.
  private val memberRe = raw"(?m)^\s{2}(?:private(?:\[\w+\])?\s+)?(?:protected\s+)?(?:override\s+)?(?:final\s+)?(?:lazy\s+)?(?:val|var|def|object|class|case\s+class|type|import)\b".r
  private val valRe = raw"(?m)^\s{2}(?:private(?:\[\w+\])?\s+)?(?:protected\s+)?(?:override\s+)?(?:final\s+)?(val) ([A-Za-z_][A-Za-z0-9_]*)\b".r
  // ALL strict member vals are hazard targets, not just the uppercase
  // constants — `val xSql = ySql` aliases bit in r12 and are lowercase
  private val constRe = raw"(?m)^\s{2}(?:private(?:\[\w+\])?\s+)?(?:final\s+)?val ([A-Za-z_][A-Za-z0-9_]*)\b".r

  private def violationsIn(pathName: String, rawSrc: String): Seq[String] = {
    val src = blankComments(rawSrc)
    def lineOf(off: Int): Int = src.substring(0, off).count(_ == '\n') + 1
    val memberStarts = memberRe.findAllMatchIn(src).map(_.start).toSeq.sorted
    // (declStart, rhsStart, rhsEnd) span of each strict member val
    val valSpans = valRe.findAllMatchIn(src).map { m =>
      val end = memberStarts.find(_ > m.start).getOrElse(src.length)
      (m.start, m.end, end)
    }.toSeq
    constRe.findAllMatchIn(src).flatMap { m =>
      val name = m.group(1)
      val declStart = m.start
      val q = java.util.regex.Pattern.quote(name)
      // usages: interpolation ($Name / ${Name) for any length; bare
      // identifier — at any position for len >= 2, at square-bracket
      // depth 0 only for single letters (inside `[...]` a one-letter
      // name is a type parameter, outside it is a value use); always
      // excluding qualified refs (Object.Name is runtime)
      def bracketDepth(off: Int): Int = {
        var d = 0; var i = 0
        while (i < off) { val c = src.charAt(i)
          if (c == '[') d += 1 else if (c == ']') d -= 1; i += 1 }
        d
      }
      val bare = raw"(?<![.\w])$q\b(?!\s*[=:]\s*)".r
        .findAllMatchIn(src).map(_.start).toSeq
      val uses =
        raw"\$$\{?$q\b".r.findAllMatchIn(src).map(_.start).toSeq ++
        (if (name.length < 2) bare.filter(bracketDepth(_) == 0) else bare)
      uses.filter(u => u < declStart &&
          valSpans.exists { case (vs, ve, end) =>
            vs < declStart && u >= ve && u < end })
        .minOption.map { use =>
          s"$pathName:${lineOf(use)} uses $name inside an earlier val's initializer (declared line ${lineOf(declStart)})"
        }
    }.toSeq
  }

  test("object-level constants are declared before their first same-file use") {
    val violations = scalaFiles(SrcRoot).flatMap { f =>
      violationsIn(f.getPath,
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    }
    assert(violations.isEmpty,
      "forward val references (silent null/0 capture at object init):\n" +
        violations.mkString("\n"))
  }

  test("the detector catches the r10/r11 bite pattern (non-vacuous guard)") {
    val planted =
      """package x
        |object Bad {
        |  val Sql = s"SELECT * FROM t WHERE d < TIMESTAMP '$SplitDate' AND l = $Lbl"
        |  val SplitDate = "1999-07-01"
        |  val Lbl = 7
        |}
        |""".stripMargin
    val got = violationsIn("planted.scala", planted)
    assert(got.size === 2, s"must flag both forward interpolations, got: $got")
    // reordered (constants first) the same source is clean
    val fixed =
      """package x
        |object Good {
        |  val SplitDate = "1999-07-01"
        |  val Lbl = 7
        |  val Sql = s"SELECT * FROM t WHERE d < TIMESTAMP '$SplitDate' AND l = $Lbl"
        |  def use: String = SplitDate + Lbl // runtime refs never flag
        |}
        |""".stripMargin
    assert(violationsIn("fixed.scala", fixed).isEmpty)
    // a bare (non-interpolated) forward reference in a val initializer
    // is the same hazard
    val bare =
      """package x
        |object AlsoBad {
        |  val Derived = Basis * 2
        |  val Basis = 21L
        |}
        |""".stripMargin
    assert(violationsIn("bare.scala", bare).nonEmpty)
    // the r12 in-the-wild instance: a lowercase SQL-alias val forward-
    // referencing the val it aliases (initializes to null)
    val alias =
      """package x
        |object AliasBad {
        |  val xSql: String = ySql
        |  val ySql: String = "SELECT 1"
        |}
        |""".stripMargin
    assert(violationsIn("alias.scala", alias).nonEmpty,
      "lowercase val-alias forward refs must be flagged")
    // the r12 advisor's hole: a forward ref to a ONE-LETTER constant
    // (value position, bracket depth 0) must flag, while the same
    // letter as a type parameter (inside `[...]`) must not
    val oneLetter =
      """package x
        |object OneBad {
        |  val Limit = K * 2
        |  val K = 5
        |  def f[K](xs: Seq[K]): Seq[K] = xs
        |}
        |""".stripMargin
    assert(violationsIn("one.scala", oneLetter).exists(_.contains("uses K")),
      "one-letter value-position forward refs must be flagged")
    val oneLetterOk =
      """package x
        |object OneGood {
        |  val K = 5
        |  val Limit = K * 2
        |  def f[K](xs: Seq[K]): Seq[K] = xs
        |}
        |""".stripMargin
    assert(violationsIn("oneok.scala", oneLetterOk).isEmpty,
      "type-parameter K and declared-first K must not flag")
  }

  test("no production source string contains a block-comment opener (guards the scan itself)") {
    // blankComments assumes '/*' never occurs inside a string literal;
    // if a future oracle embeds a SQL block comment this fails loudly
    // instead of the scan silently blanking real code.
    val offenders = scalaFiles(SrcRoot).filter { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      // a '/*' inside a quoted string: the opener appears between two
      // quote chars on one line — cheap approximation, zero hits today
      src.linesIterator.exists(l => l.matches(""".*"[^"]*/\*[^"]*".*"""))
    }
    assert(offenders.isEmpty,
      s"string literals containing '/*' break the comment scan: ${offenders.map(_.getPath)}")
  }
}
