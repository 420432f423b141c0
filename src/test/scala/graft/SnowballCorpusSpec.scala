package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.SnowballStemmers

/** Bulk corpus re-diff of the Scala stemmer ports against dumped
  * PostgreSQL-snowball ground truth (the r11/r12 convergence method:
  * a Python prototype is converged to zero diffs against
  * `ts_lexize('pure_<lang>', word)`, then the Scala port is re-diffed
  * against a dumped corpus to catch porting slips).
  *
  * Corpus files are machine-local dumps at /tmp/<lang>_corpus.tsv
  * (word <TAB> expected). When absent the test cancels rather than
  * fails — the 30+ per-language vectors in SnowballStemmerSpec remain
  * the always-on gate.
  */
class SnowballCorpusSpec extends AnyFunSuite with Matchers {

  private val corpora = Map(
    "fi" -> "/tmp/fi_corpus.tsv",
    "hu" -> "/tmp/hu_corpus.tsv",
    "tr" -> "/tmp/tr_corpus.tsv")

  for ((lang, path) <- corpora) {
    test(s"$lang port matches the PG snowball corpus dump") {
      assume(new File(path).exists, s"$path not present on this machine")
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try {
        val bad = src.getLines().flatMap { line =>
          val Array(w, exp) = line.split("\t", 2)
          val got = SnowballStemmers.stem(w, lang)
          if (got != exp) Some(s"$w: got '$got' want '$exp'") else None
        }.take(10).toList
        withClue(bad.mkString("\n")) { bad shouldBe empty }
      } finally src.close()
    }
  }
}
