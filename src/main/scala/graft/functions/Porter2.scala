package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter2 ("English Snowball") stemmer, implemented from the published
  * algorithm description (snowballstem.org / M.F. Porter, 2001). Backs
  * `word_stem` — the reference delegates to the Snowball EnglishStemmer
  * (presto-main/src/main/java/com/facebook/presto/operator/scalar/
  * WordStemFunction.java:82); expected outputs cross-checked against its
  * test vectors (presto-main/src/test/java/com/facebook/presto/operator/
  * scalar/TestWordStemFunction.java:26-35).
  *
  * Backs the 1-arg `word_stem` and lang='en'; the other implemented
  * Snowball codes dispatch through [[SnowballStemmers]] (see
  * [[WordStem2]]), and unknown codes raise.
  */
object Porter2 {

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  // special-cased whole words (exception1 in the Snowball script)
  private val Mapped: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl")
  private val Invariant: Set[String] =
    Set("sky", "news", "howe", "atlas", "cosmos", "bias", "andes")
  // stop after step 1a (exception2 in the Snowball script)
  private val StopAfter1a: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val Doubles = "bdfgmnprt"      // bb dd ff gg mm nn pp rr tt
  private val LiEndings = "cdeghkmnrt"   // valid li- endings

  /** Region start: after the first non-vowel that follows a vowel. */
  private def regionAfterVC(w: String, start: Int): Int = {
    var i = start
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    while (i < w.length && isVowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  private def endsInShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      !isVowel(w.charAt(n - 3)) && isVowel(w.charAt(n - 2)) &&
        !isVowel(c) && c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  private def endsWithDouble(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) &&
      Doubles.indexOf(w.charAt(n - 1)) >= 0
  }

  // longest-match suffix tables, ordered by suffix length descending —
  // like Snowball's `among`, the longest match is chosen FIRST and its
  // condition tested ONCE (no fallthrough to shorter suffixes).
  private val Step2: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive",
    "tional" -> "tion", "biliti" -> "ble", "lessli" -> "less",
    "entli" -> "ent", "ation" -> "ate", "alism" -> "al", "aliti" -> "al",
    "ousli" -> "ous", "iviti" -> "ive", "fulli" -> "ful",
    "enci" -> "ence", "anci" -> "ance", "abli" -> "able",
    "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble", "ogi" -> "og", "li" -> "")

  private val Step3: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
    "ness" -> "", "ful" -> "")

  private val Step4: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")

  def stem(input: String): String = {
    if (input.length < 3) return input
    var w = if (input.charAt(0) == '\'') input.substring(1) else input
    Mapped.get(w) match {
      case Some(s) => return s
      case None =>
    }
    if (Invariant.contains(w) || w.length < 3) return w

    // prelude: mark consonant-usage y as Y (initial y, or y after vowel)
    if (w.indexOf('y') >= 0) {
      val sb = new java.lang.StringBuilder(w)
      if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        i += 1
      }
      w = sb.toString
    }

    // R1/R2 are absolute positions fixed for the rest of the run
    val r1 =
      if (w.startsWith("gener") || w.startsWith("commun") || w.startsWith("arsen")) {
        if (w.startsWith("commun")) 6 else 5
      } else regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)

    // step 0: longest of  '  's  's'
    if (w.endsWith("'s'")) w = w.substring(0, w.length - 3)
    else if (w.endsWith("'s")) w = w.substring(0, w.length - 2)
    else if (w.endsWith("'")) w = w.substring(0, w.length - 1)

    // step 1a
    if (w.endsWith("sses")) w = w.substring(0, w.length - 2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length - 3 > 1) w.substring(0, w.length - 2)
          else w.substring(0, w.length - 1)
    } else if (w.endsWith("us") || w.endsWith("ss")) {
      // no action
    } else if (w.endsWith("s")) {
      // delete if a vowel exists before (not immediately before) the s
      var hasV = false
      var i = 0
      while (i < w.length - 2 && !hasV) { hasV = isVowel(w.charAt(i)); i += 1 }
      if (hasV) w = w.substring(0, w.length - 1)
    }

    if (StopAfter1a.contains(w)) return w

    // step 1b
    locally {
      val suf = Seq("eedly", "ingly", "edly", "eed", "ing", "ed").find(w.endsWith)
      suf match {
        case Some(s @ ("eedly" | "eed")) =>
          if (w.length - s.length >= r1)
            w = w.substring(0, w.length - s.length) + "ee"
        case Some(s) =>
          val prefix = w.substring(0, w.length - s.length)
          if (prefix.exists(isVowel)) {
            w = prefix
            if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
            else if (endsWithDouble(w)) w = w.substring(0, w.length - 1)
            else if (r1 >= w.length && endsInShortSyllable(w)) w += "e"
          }
        case None =>
      }
    }

    // step 1c: y/Y -> i after a non-vowel that is not the first letter
    locally {
      val n = w.length
      if (n >= 3 && (w.charAt(n - 1) == 'y' || w.charAt(n - 1) == 'Y') &&
          !isVowel(w.charAt(n - 2)))
        w = w.substring(0, n - 1) + "i"
    }

    // step 2 (in R1)
    Step2.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, repl)) if w.length - s.length >= r1 =>
        val start = w.length - s.length
        s match {
          case "ogi" =>
            if (start >= 1 && w.charAt(start - 1) == 'l')
              w = w.substring(0, start) + "og"
          case "li" =>
            if (start >= 1 && LiEndings.indexOf(w.charAt(start - 1)) >= 0)
              w = w.substring(0, start)
          case _ => w = w.substring(0, start) + repl
        }
      case _ =>
    }

    // step 3 (in R1; ative additionally requires R2)
    Step3.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, repl)) if w.length - s.length >= r1 =>
        val start = w.length - s.length
        if (s == "ative") { if (start >= r2) w = w.substring(0, start) }
        else w = w.substring(0, start) + repl
      case _ =>
    }

    // step 4 (in R2; ion only after s/t)
    Step4.find(w.endsWith) match {
      case Some(s) if w.length - s.length >= r2 =>
        val start = w.length - s.length
        if (s == "ion") {
          if (start >= 1 && (w.charAt(start - 1) == 's' || w.charAt(start - 1) == 't'))
            w = w.substring(0, start)
        } else w = w.substring(0, start)
      case _ =>
    }

    // step 5
    locally {
      val n = w.length
      if (n >= 1 && w.charAt(n - 1) == 'e') {
        val start = n - 1
        if (start >= r2 ||
            (start >= r1 && !endsInShortSyllable(w.substring(0, start))))
          w = w.substring(0, start)
      } else if (n >= 2 && w.charAt(n - 1) == 'l') {
        val start = n - 1
        if (start >= r2 && w.charAt(start - 1) == 'l') w = w.substring(0, start)
      }
    }

    w.replace('Y', 'y')
  }

  /** Entry point for both codegen'd and interpreted paths. Like the
    * reference (WordStemFunction.java:100-104) the input is stemmed
    * as-is — Snowball semantics assume lowercase; uppercase letters are
    * simply not vowels, so mixed-case words pass through mostly
    * unchanged on both engines.
    */
  def stemWord(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString))
}

/** word_stem(word[, lang]) — WordStemFunction.java:82-97. Stays inside
  * WholeStageCodegen via a static call.
  */
case class WordStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "word_stem"
  override protected def nullSafeEval(v: Any): Any =
    Porter2.stemWord(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Porter2.stemWord($c)")
  override protected def withNewChildInternal(newChild: Expression): WordStem =
    copy(child = newChild)
}

/** word_stem(word, lang) — WordStemFunction.java:56-97. Dispatches by
  * 2-letter Snowball code PER ROW (the reference resolves the stemmer
  * from the lang argument at call time, so a non-literal lang column
  * works: `word_stem(w, doc_lang)`); 'en' routes to [[Porter2]], the
  * other implemented codes to [[SnowballStemmers]], and an unknown
  * code raises the reference's "Unknown stemmer language" shape.
  * Stays inside WholeStageCodegen via a static call. */
case class WordStem2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "word_stem"
  override protected def nullSafeEval(w: Any, l: Any): Any =
    WordStem2.stemWord(w.asInstanceOf[UTF8String], l.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, l) => s"graft.functions.WordStem2.stemWord($w, $l)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordStem2 =
    copy(left = newLeft, right = newRight)
}

object WordStem2 {
  def stemWord(w: UTF8String, lang: UTF8String): UTF8String =
    UTF8String.fromString(SnowballStemmers.stem(w.toString, lang.toString))
}
