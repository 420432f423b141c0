package graft.functions

/** Snowball stemmers backing the 2-arg `word_stem` — ALL 20 languages
  * the reference dispatches by 2-letter code
  * (presto-main/.../scalar/WordStemFunction.java:48-77), implemented
  * from the published algorithm descriptions (snowballstem.org /
  * M.F. Porter) or recovered exactly from PostgreSQL 15's open-source
  * snowball build (see the per-language headers), and including every
  * non-English vector from the reference's own
  * TestWordStemFunction.java:39-43 (see SnowballStemmerSpec).
  *
  * Shared machinery: R1 = region after the first non-vowel following
  * a vowel; R2 = the same, starting from R1; RV per language. All
  * region marks are ABSOLUTE positions computed once up front (after
  * the prelude) — suffix conditions compare start offsets against
  * them, exactly like the Snowball runtime's integer marks. Suffix
  * tables use longest-match-wins with NO fallthrough: the longest
  * matching suffix is chosen first and its condition tested once.
  */
object SnowballStemmers {

  private def regionAfter(w: String, start: Int, isV: Char => Boolean): Int = {
    var i = start
    while (i < w.length && !isV(w.charAt(i))) i += 1
    while (i < w.length && isV(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** RV for Spanish/Portuguese/Italian: second letter consonant → after
    * the next vowel; first two letters vowels → after the next
    * consonant; consonant-vowel → after the third letter. */
  private def rvRomance(w: String, isV: Char => Boolean): Int = {
    val n = w.length
    if (n < 3) return n
    if (!isV(w.charAt(1))) {
      var i = 2
      while (i < n && !isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else if (isV(w.charAt(0))) {
      var i = 2
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else 3
  }

  /** First (longest) suffix of `w` from `sufs`, which MUST be sorted by
    * length descending. */
  private def longest(w: String, sufs: Seq[String]): Option[String] =
    sufs.find(w.endsWith)

  // For suffix groups the .sbl runs inside `setlimit tomark pV`
  // (attached pronouns and verb suffixes in es/pt/it/fr), use
  // `longestIn(w, rv, sufs)` below: the region limit constrains the
  // MATCH itself, so a longer suffix reaching past RV is passed over
  // in favor of a shorter one that fits (PG oracle: spanish
  // 'buáramos'→'buar' strips 'amos' because 'áramos' starts before
  // RV). Distinct from a per-entry R1/R2/RV test-once condition,
  // where a failing longest match ends the step.

  private def byLen(ss: String*): Seq[String] = ss.sortBy(-_.length)

  /** Locale-independent lowercase using Unicode SIMPLE mappings
    * (per-char `Character.toLowerCase`), matching glibc `towlower` as
    * used by the PostgreSQL snowball oracle's `lowerstr`. The
    * String#toLowerCase it replaces is default-locale sensitive: under
    * a tr/az JVM locale 'I' would lowercase to 'ı', silently changing
    * results per machine; and full mappings turn 'İ' into "i̇"
    * where the oracle's simple mapping gives plain 'i'. Used by the
    * three PG-lowercasing stemmers (fi/hu/tr). */
  private def lowerSimple(s: String): String = s.map(Character.toLowerCase)

  // ===================================================================
  // German — the GERMAN2 Snowball variant, which is what the reference
  // registers for 'de' (WordStemFunction.java:59 → Lucene
  // German2Stemmer). German2 differs from standard german only in the
  // prelude: after the u/y-between-vowels marking (which therefore
  // protects genuine hiatus spellings like 'neue'/'mauer' from
  // folding), the digraphs ae/oe/ue are folded to ä/ö/ü, with 'qu'
  // hopped over so the u of 'qu' never folds ('quelle' → 'quell').
  // Everything after the prelude is the standard algorithm, converged
  // against PostgreSQL's german snowball (which is the standard
  // variant — ts_lexize('german_stem','haeuser') = 'haeus', so no PG
  // oracle exists for the fold; the digraph vectors in
  // SnowballStemmerSpec come from the published german2 description).
  // ===================================================================
  object German {
    private val vowels = "aeiouyäöü"
    private def isV(c: Char) = vowels.indexOf(c) >= 0
    private val sEnding = "bdfghklmnrt"
    private val stEnding = "bdfghklmnt"
    private val step1 = byLen("ern", "em", "er", "en", "es", "e", "s")
    private val step2 = byLen("est", "en", "er", "st")
    private val step3 = byLen("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")

    def stem(input: String): String = {
      var w = input.replace("ß", "ss")
      val sb = new java.lang.StringBuilder(w)
      var i = 1
      while (i < sb.length - 1) {
        val c = sb.charAt(i)
        if ((c == 'u' || c == 'y') && isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
          sb.setCharAt(i, Character.toUpperCase(c))
        i += 1
      }
      w = sb.toString
      // german2 digraph fold: ae/oe/ue → ä/ö/ü, consuming 'qu' whole
      // so its u starts no digraph. Runs AFTER the marking pass, so a
      // u already marked 'U' (true hiatus) is never folded.
      if (w.indexOf("ae") >= 0 || w.indexOf("oe") >= 0 ||
          w.indexOf("ue") >= 0 || w.indexOf("qu") >= 0) {
        val fb = new java.lang.StringBuilder(w.length)
        var j = 0
        while (j < w.length) {
          val c0 = w.charAt(j)
          val c1 = if (j + 1 < w.length) w.charAt(j + 1) else ' '
          (c0, c1) match {
            case ('a', 'e') => fb.append('ä'); j += 2
            case ('o', 'e') => fb.append('ö'); j += 2
            case ('u', 'e') => fb.append('ü'); j += 2
            case ('q', 'u') => fb.append("qu"); j += 2
            case _          => fb.append(c0); j += 1
          }
        }
        w = fb.toString
      }
      val r1raw = regionAfter(w, 0, isV)
      val r1 = math.max(r1raw, 3) // region before R1 must hold >= 3 letters
      val r2 = regionAfter(w, r1raw, isV)

      // step 1
      longest(w, step1) match {
        case Some("s") =>
          val st = w.length - 1
          if (st >= r1 && st >= 1 && sEnding.indexOf(w.charAt(st - 1)) >= 0)
            w = w.substring(0, st)
        case Some(s) =>
          val st = w.length - s.length
          if (st >= r1) {
            w = w.substring(0, st)
            // group (b) e/en/es: an ending preceded by niss loses the
            // double s too (bedürfnissen → bedürfnis)
            if ((s == "e" || s == "en" || s == "es") && w.endsWith("niss"))
              w = w.substring(0, w.length - 1)
          }
        case None =>
      }
      // step 2
      longest(w, step2) match {
        case Some("st") =>
          val st = w.length - 2
          if (st >= r1 && st >= 4 && stEnding.indexOf(w.charAt(st - 1)) >= 0)
            w = w.substring(0, st)
        case Some(s) =>
          val st = w.length - s.length
          if (st >= r1) w = w.substring(0, st)
        case None =>
      }
      // step 3 (d-suffixes)
      longest(w, step3) match {
        case Some(s @ ("end" | "ung")) =>
          val st = w.length - s.length
          if (st >= r2) {
            w = w.substring(0, st)
            if (w.endsWith("ig") && w.length - 2 >= r2 &&
              (w.length < 3 || w.charAt(w.length - 3) != 'e'))
              w = w.substring(0, w.length - 2)
          }
        case Some(s @ ("ig" | "ik" | "isch")) =>
          val st = w.length - s.length
          if (st >= r2 && (st == 0 || w.charAt(st - 1) != 'e'))
            w = w.substring(0, st)
        case Some(s @ ("lich" | "heit")) =>
          val st = w.length - s.length
          if (st >= r2) {
            w = w.substring(0, st)
            if ((w.endsWith("er") || w.endsWith("en")) && w.length - 2 >= r1)
              w = w.substring(0, w.length - 2)
          }
        case Some("keit") =>
          val st = w.length - 4
          if (st >= r2) {
            w = w.substring(0, st)
            if (w.endsWith("lich") && w.length - 4 >= r2)
              w = w.substring(0, w.length - 4)
            else if (w.endsWith("ig") && w.length - 2 >= r2)
              w = w.substring(0, w.length - 2)
          }
        case _ =>
      }
      w.replace('U', 'u').replace('Y', 'y')
        .replace('ä', 'a').replace('ö', 'o').replace('ü', 'u')
    }
  }

  // ===================================================================
  // Spanish
  // ===================================================================
  object Spanish {
    private val vowels = "aeiouáéíóúü"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val pronouns = byLen("me", "se", "sela", "selo", "selas", "selos",
      "la", "le", "lo", "las", "les", "los", "nos")
    private val pre0a = byLen("iéndo", "ándo", "ár", "ér", "ír")
    private val pre0b = byLen("ando", "iendo", "ar", "er", "ir")
    private val pre0ab = byLen((pre0a ++ pre0b): _*)

    private val g1a = byLen("anza", "anzas", "ico", "ica", "icos", "icas",
      "ismo", "ismos", "able", "ables", "ible", "ibles", "ista", "istas",
      "oso", "osa", "osos", "osas", "amiento", "amientos", "imiento", "imientos")
    private val g1b = byLen("adora", "ador", "ación", "adoras", "adores",
      "aciones", "ante", "antes", "ancia", "ancias")
    private val step1All = byLen((g1a ++ g1b ++ Seq("logía", "logías",
      "ución", "uciones", "encia", "encias", "amente", "mente", "idad",
      "idades", "iva", "ivo", "ivas", "ivos")): _*)

    private val step2a = byLen("ya", "ye", "yan", "yen", "yeron", "yendo",
      "yo", "yó", "yas", "yes", "yais", "yamos")
    private val step2bGu = byLen("en", "es", "éis", "emos")
    private val step2b = byLen("arían", "arías", "arán", "arás", "aríais",
      "aría", "aréis", "aríamos", "aremos", "ará", "aré", "erían", "erías",
      "erán", "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
      "eré", "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
      "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
      "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an", "aban",
      "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron", "ado", "ido",
      "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas", "adas", "idas",
      "ías", "aras", "ieras", "ases", "ieses", "ís", "áis", "abais", "íais",
      "arais", "ierais", "aseis", "ieseis", "asteis", "isteis", "ados",
      "idos", "amos", "ábamos", "íamos", "imos", "áramos", "iéramos",
      "iésemos", "ásemos", "en", "es", "éis", "emos")

    private def deAccent(s: String): String =
      s.map {
        case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
        case 'ó' => 'o'; case 'ú' => 'u'; case c => c
      }

    def stem(input: String): String = {
      var w = input
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = rvRomance(w, isV)

      // step 0: attached pronoun (setlimit tomark pV — both the
      // pronoun and the preceding gerund/infinitive match within RV)
      longestIn(w, rv, pronouns).foreach { p =>
        val base = w.substring(0, w.length - p.length)
        longestIn(base, rv, pre0ab) match {
          case Some(a) if pre0a.contains(a) =>
            w = base.substring(0, base.length - a.length) + deAccent(a)
          case Some(_) =>
            w = base
          case _ =>
            if (base.endsWith("uyendo") && base.length - 5 >= rv)
              w = base
        }
      }

      val before1 = w
      // step 1: standard suffix removal
      longest(w, step1All) match {
        case Some(s) =>
          val st = w.length - s.length
          s match {
            case _ if g1a.contains(s) =>
              if (st >= r2) w = w.substring(0, st)
            case _ if g1b.contains(s) =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("ic") && w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "logía" | "logías" =>
              if (st >= r2) w = w.substring(0, st) + "log"
            case "ución" | "uciones" =>
              if (st >= r2) w = w.substring(0, st) + "u"
            case "encia" | "encias" =>
              if (st >= r2) w = w.substring(0, st) + "ente"
            case "amente" =>
              if (st >= r1) {
                w = w.substring(0, st)
                if (w.endsWith("iv") && w.length - 2 >= r2) {
                  w = w.substring(0, w.length - 2)
                  if (w.endsWith("at") && w.length - 2 >= r2)
                    w = w.substring(0, w.length - 2)
                } else if ((w.endsWith("os") || w.endsWith("ic") ||
                  w.endsWith("ad")) && w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "mente" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if ((w.endsWith("ante") || w.endsWith("able") ||
                  w.endsWith("ible")) && w.length - 4 >= r2)
                  w = w.substring(0, w.length - 4)
              }
            case "idad" | "idades" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.substring(0, w.length - 4)
                else if ((w.endsWith("ic") || w.endsWith("iv")) &&
                  w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "iva" | "ivo" | "ivas" | "ivos" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("at") && w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case _ =>
          }
        case None =>
      }

      if (w == before1) {
        // step 2a: verb suffixes beginning y (match limited to RV),
        // preceded by u (the u may lie outside RV)
        val before2a = w
        longestIn(w, rv, step2a) match {
          case Some(s) =>
            val st = w.length - s.length
            if (st >= 1 && w.charAt(st - 1) == 'u')
              w = w.substring(0, st)
          case None =>
        }
        if (w == before2a) {
          // step 2b: other verb suffixes (match limited to RV)
          longestIn(w, rv, step2b) match {
            case Some(s) =>
              val st = w.length - s.length
              w = w.substring(0, st)
              // the trailing u of gu drops with no RV constraint on
              // the u itself (PG: 'ígues' → 'ig', u at pos 2 < RV 3)
              if (step2bGu.contains(s) && w.endsWith("gu"))
                w = w.substring(0, w.length - 1)
            case None =>
          }
        }
      }

      // step 3: residual suffix (always)
      longest(w, byLen("os", "a", "o", "á", "í", "ó", "e", "é")) match {
        case Some(s @ ("e" | "é")) =>
          val st = w.length - s.length
          if (st >= rv) {
            w = w.substring(0, st)
            if (w.endsWith("gu") && w.length - 1 >= rv)
              w = w.substring(0, w.length - 1)
          }
        case Some(s) =>
          val st = w.length - s.length
          if (st >= rv) w = w.substring(0, st)
        case None =>
      }
      deAccent(w)
    }
  }

  // ===================================================================
  // Portuguese
  // ===================================================================
  object Portuguese {
    // after the prelude ã→a~, õ→o~ the marker ~ is a non-vowel
    private val vowels = "aeiouáéíóúâêô"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val g1a = byLen("eza", "ezas", "ico", "ica", "icos", "icas",
      "ismo", "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
      "osos", "osas", "amento", "amentos", "imento", "imentos", "adora",
      "ador", "aça~o", "adoras", "adores", "aço~es", "ante", "antes",
      "ância")
    private val step1All = byLen((g1a ++ Seq("logia", "logias", "uça~o",
      "uço~es", "ência", "ências", "amente", "mente", "idade", "idades",
      "iva", "ivo", "ivas", "ivos", "ira", "iras")): _*)

    private val step2 = byLen("ada", "ida", "ia", "aria", "eria", "iria",
      "ará", "ara", "erá", "era", "irá", "ava", "asse", "esse", "isse",
      "aste", "este", "iste", "ei", "arei", "erei", "irei", "am", "iam",
      "ariam", "eriam", "iriam", "aram", "eram", "iram", "avam", "em",
      "arem", "erem", "irem", "assem", "essem", "issem", "ado", "ido",
      "ando", "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir",
      "as", "adas", "idas", "ias", "arias", "erias", "irias", "arás",
      "aras", "erás", "eras", "irás", "avas", "es", "ardes", "erdes",
      "irdes", "ares", "eres", "ires", "asses", "esses", "isses", "astes",
      "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
      "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
      "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos", "ámos",
      "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
      "éramos", "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
      "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
      "eu", "iu", "ou", "ira", "iras")

    def stem(input: String): String = {
      var w = input.replace("ã", "a~").replace("õ", "o~")
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = rvRomance(w, isV)

      val before1 = w
      longest(w, step1All) match {
        case Some(s) =>
          val st = w.length - s.length
          s match {
            case _ if g1a.contains(s) =>
              if (st >= r2) w = w.substring(0, st)
            case "logia" | "logias" =>
              if (st >= r2) w = w.substring(0, st) + "log"
            case "uça~o" | "uço~es" =>
              if (st >= r2) w = w.substring(0, st) + "u"
            case "ência" | "ências" =>
              if (st >= r2) w = w.substring(0, st) + "ente"
            case "amente" =>
              if (st >= r1) {
                w = w.substring(0, st)
                if (w.endsWith("iv") && w.length - 2 >= r2) {
                  w = w.substring(0, w.length - 2)
                  if (w.endsWith("at") && w.length - 2 >= r2)
                    w = w.substring(0, w.length - 2)
                } else if ((w.endsWith("os") || w.endsWith("ic") ||
                  w.endsWith("ad")) && w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "mente" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if ((w.endsWith("ante") || w.endsWith("avel") ||
                  w.endsWith("ível")) && w.length - 4 >= r2)
                  w = w.substring(0, w.length - 4)
              }
            case "idade" | "idades" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.substring(0, w.length - 4)
                else if ((w.endsWith("ic") || w.endsWith("iv")) &&
                  w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "iva" | "ivo" | "ivas" | "ivos" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("at") && w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "ira" | "iras" =>
              if (st >= rv && st >= 1 && w.charAt(st - 1) == 'e')
                w = w.substring(0, st) + "ir"
            case _ =>
          }
        case None =>
      }

      var altered = w != before1
      if (!altered) {
        val before2 = w
        // verb suffixes: match limited to RV (setlimit tomark pV)
        longestIn(w, rv, step2) match {
          case Some(s) => w = w.substring(0, w.length - s.length)
          case None =>
        }
        altered = w != before2
      }
      // step 3: i after c (only if 1 or 2 altered)
      if (altered && w.endsWith("ci") && w.length - 1 >= rv)
        w = w.substring(0, w.length - 1)
      // step 4: residual suffix (only if neither 1 nor 2 altered)
      if (!altered) {
        longest(w, byLen("os", "a", "i", "o", "á", "í", "ó")) match {
          case Some(s) =>
            val st = w.length - s.length
            if (st >= rv) w = w.substring(0, st)
          case None =>
        }
      }
      // step 5: final e/é/ê (always), then cedilla
      longest(w, Seq("e", "é", "ê")) match {
        case Some(s) =>
          val st = w.length - 1
          if (st >= rv) {
            w = w.substring(0, st)
            if ((w.endsWith("gu") || w.endsWith("ci")) && w.length - 1 >= rv)
              w = w.substring(0, w.length - 1)
          }
        case None =>
          if (w.endsWith("ç")) w = w.substring(0, w.length - 1) + "c"
      }
      w.replace("a~", "ã").replace("o~", "õ")
    }
  }

  // ===================================================================
  // Italian
  // ===================================================================
  object Italian {
    private val vowels = "aeiouàèìòù"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val pronouns = byLen("ci", "gli", "la", "le", "li", "lo", "mi",
      "ne", "si", "ti", "vi", "sene", "gliela", "gliele", "glieli",
      "glielo", "gliene", "mela", "mele", "meli", "melo", "mene", "tela",
      "tele", "teli", "telo", "tene", "cela", "cele", "celi", "celo",
      "cene", "vela", "vele", "veli", "velo", "vene")

    private val g1a = byLen("anza", "anze", "ico", "ici", "ica", "ice",
      "iche", "ichi", "ismo", "ismi", "abile", "abili", "ibile", "ibili",
      "ista", "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
      "ose", "mente", "atrice", "atrici", "ante", "anti")
    private val g1ic = byLen("azione", "azioni", "atore", "atori")
    private val step1All = byLen((g1a ++ g1ic ++ Seq("logia", "logie",
      "uzione", "uzioni", "usione", "usioni", "enza", "enze", "amento",
      "amenti", "imento", "imenti", "amente", "ità", "ivo", "ivi", "iva",
      "ive")): _*)

    private val step2 = byLen("ammo", "ando", "ano", "are", "arono",
      "asse", "assero", "assi", "assimo", "ata", "ate", "ati", "ato",
      "ava", "avamo", "avano", "avate", "avi", "avo", "emmo", "enda",
      "ende", "endi", "endo", "erà", "erai", "eranno", "ere", "erebbe",
      "erebbero", "erei", "eremmo", "eremo", "ereste", "eresti", "erete",
      "erò", "erono", "essero", "ete", "eva", "evamo", "evano", "evate",
      "evi", "evo", "Yamo", "iamo", "immo", "irà", "irai", "iranno",
      "ire", "irebbe", "irebbero", "irei", "iremmo", "iremo", "ireste",
      "iresti", "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
      "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
      "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti",
      "uto", "ar", "ir")

    def stem(input: String): String = {
      var w = input.map {
        case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
        case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
      }
      val sb = new java.lang.StringBuilder(w)
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == 'u' && i >= 1 && sb.charAt(i - 1) == 'q')
          sb.setCharAt(i, 'U')
        else if ((c == 'u' || c == 'i') && i >= 1 && i < sb.length - 1 &&
          isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
          sb.setCharAt(i, Character.toUpperCase(c))
        i += 1
      }
      w = sb.toString
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = rvRomance(w, isV)

      // step 0: attached pronoun (setlimit tomark pV: match in RV)
      longestIn(w, rv, pronouns).foreach { p =>
        val base = w.substring(0, w.length - p.length)
        if ((base.endsWith("ando") || base.endsWith("endo")) &&
          base.length - 4 >= rv)
          w = base
        else if ((base.endsWith("ar") || base.endsWith("er") ||
          base.endsWith("ir")) && base.length - 2 >= rv)
          w = base + "e"
      }

      val before1 = w
      longest(w, step1All) match {
        case Some(s) =>
          val st = w.length - s.length
          s match {
            case _ if g1a.contains(s) =>
              if (st >= r2) w = w.substring(0, st)
            case _ if g1ic.contains(s) =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("ic") && w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "logia" | "logie" =>
              if (st >= r2) w = w.substring(0, st) + "log"
            case "uzione" | "uzioni" | "usione" | "usioni" =>
              if (st >= r2) w = w.substring(0, st) + "u"
            case "enza" | "enze" =>
              if (st >= r2) w = w.substring(0, st) + "ente"
            case "amento" | "amenti" | "imento" | "imenti" =>
              if (st >= rv) w = w.substring(0, st)
            case "amente" =>
              if (st >= r1) {
                w = w.substring(0, st)
                if (w.endsWith("iv") && w.length - 2 >= r2) {
                  w = w.substring(0, w.length - 2)
                  if (w.endsWith("at") && w.length - 2 >= r2)
                    w = w.substring(0, w.length - 2)
                } else if ((w.endsWith("os") || w.endsWith("ic")) &&
                  w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
                else if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.substring(0, w.length - 4)
              }
            case "ità" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("abil") && w.length - 4 >= r2)
                  w = w.substring(0, w.length - 4)
                else if ((w.endsWith("ic") || w.endsWith("iv")) &&
                  w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "ivo" | "ivi" | "iva" | "ive" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("at") && w.length - 2 >= r2) {
                  w = w.substring(0, w.length - 2)
                  if (w.endsWith("ic") && w.length - 2 >= r2)
                    w = w.substring(0, w.length - 2)
                }
              }
            case _ =>
          }
        case None =>
      }

      if (w == before1) {
        // verb suffixes: match limited to RV (setlimit tomark pV)
        longestIn(w, rv, step2) match {
          case Some(s) => w = w.substring(0, w.length - s.length)
          case None =>
        }
      }

      // step 3a: final vowel, then a preceding i
      locally {
        val n = w.length
        if (n >= 1 && "aeioàèìò".indexOf(w.charAt(n - 1)) >= 0 &&
          n - 1 >= rv) {
          w = w.substring(0, n - 1)
          if (w.nonEmpty && w.charAt(w.length - 1) == 'i' &&
            w.length - 1 >= rv)
            w = w.substring(0, w.length - 1)
        }
      }
      // step 3b: ch → c, gh → g
      if ((w.endsWith("ch") || w.endsWith("gh")) && w.length - 2 >= rv)
        w = w.substring(0, w.length - 1)

      w.replace('I', 'i').replace('U', 'u')
    }
  }

  // ===================================================================
  // French
  // ===================================================================
  object French {
    private val vowels = "aeiouyâàëéêèïîôûù"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val g1a = byLen("ance", "iqUe", "isme", "able", "iste", "eux",
      "ances", "iqUes", "ismes", "ables", "istes")
    private val g1ic = byLen("atrice", "ateur", "ation", "atrices",
      "ateurs", "ations")
    private val step1All = byLen((g1a ++ g1ic ++ Seq("logie", "logies",
      "usion", "ution", "usions", "utions", "ence", "ences", "ement",
      "ements", "ité", "ités", "if", "ive", "ifs", "ives", "eaux", "aux",
      "euse", "euses", "issement", "issements", "amment", "emment",
      "ment", "ments")): _*)

    private val step2a = byLen("îmes", "ît", "îtes", "i", "ie", "ies",
      "ir", "ira", "irai", "iraIent", "irais", "irait", "iras", "irent",
      "irez", "iriez", "irions", "irons", "iront", "is", "issaIent",
      "issais", "issait", "issant", "issante", "issantes", "issants",
      "isse", "issent", "isses", "issez", "issiez", "issions", "issons",
      "it")
    private val step2bE = byLen("é", "ée", "ées", "és", "èrent", "er",
      "era", "erai", "eraIent", "erais", "erait", "eras", "erez", "eriez",
      "erions", "erons", "eront", "ez", "iez")
    private val step2bA = byLen("âmes", "ât", "âtes", "a", "ai", "aIent",
      "ais", "ait", "ant", "ante", "antes", "ants", "as", "asse",
      "assent", "asses", "assiez", "assions")
    private val step2bAll = byLen((step2bE ++ step2bA ++ Seq("ions")): _*)

    private def rvOf(w: String): Int = {
      val n = w.length
      if (n < 3) return n
      if (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap"))
        return 3
      if (isV(w.charAt(0)) && isV(w.charAt(1))) return 3
      var i = 1
      while (i < n && !isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }

    def stem(input: String): String = {
      // prelude: one left-to-right scan, alternatives in PG-oracle-
      // recovered order. (1) ë → He / ï → Hi, with the cursor landing
      // ON the inserted e/i so it immediately anchors the marking
      // alternative ('ëuis' → HeUis → 'ëu': the U supplies step 2a's
      // required non-vowel). (2) anchored at a vowel (ë/ï still count
      // as vowels for the TRAILING tests — 'remtyïance' marks its y
      // because ï follows): a following u/i is marked U/I when a
      // vowel follows it, a following y is always marked Y. (3) y
      // before a vowel → Y. (4) u after q → U. The postlude restores
      // a still-intact He/Hi to ë/ï and deletes a bare H ('haïe' →
      // haHie → haHi → 'haï'; 'aiguë' → aiguHe → 'aigu').
      val sb = new java.lang.StringBuilder(input)
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        var adv = 1
        if (c == 'ë') sb.replace(i, i + 1, "He")
        else if (c == 'ï') sb.replace(i, i + 1, "Hi")
        else if (isV(c) && i + 1 < sb.length) {
          val d = sb.charAt(i + 1)
          if ((d == 'u' || d == 'i') && i + 2 < sb.length &&
            isV(sb.charAt(i + 2))) {
            sb.setCharAt(i + 1, Character.toUpperCase(d)); adv = 2
          } else if (d == 'y') {
            sb.setCharAt(i + 1, 'Y'); adv = 2
          } else if (c == 'y' && isV(d)) {
            sb.setCharAt(i, 'Y')
          }
        } else if (c == 'q' && i + 1 < sb.length && sb.charAt(i + 1) == 'u') {
          sb.setCharAt(i + 1, 'U'); adv = 2
        }
        i += adv
      }
      var w = sb.toString
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = rvOf(w)

      val before1 = w
      var mentFound = false
      longest(w, step1All) match {
        case Some(s) =>
          val st = w.length - s.length
          s match {
            case _ if g1a.contains(s) =>
              if (st >= r2) w = w.substring(0, st)
            case _ if g1ic.contains(s) =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("ic")) {
                  if (w.length - 2 >= r2) w = w.substring(0, w.length - 2)
                  else w = w.substring(0, w.length - 2) + "iqU"
                }
              }
            case "logie" | "logies" =>
              if (st >= r2) w = w.substring(0, st) + "log"
            case "usion" | "ution" | "usions" | "utions" =>
              if (st >= r2) w = w.substring(0, st) + "u"
            case "ence" | "ences" =>
              if (st >= r2) w = w.substring(0, st) + "ent"
            case "ement" | "ements" =>
              if (st >= rv) {
                w = w.substring(0, st)
                if (w.endsWith("iv") && w.length - 2 >= r2) {
                  w = w.substring(0, w.length - 2)
                  if (w.endsWith("at") && w.length - 2 >= r2)
                    w = w.substring(0, w.length - 2)
                } else if (w.endsWith("eus")) {
                  if (w.length - 3 >= r2) w = w.substring(0, w.length - 3)
                  else if (w.length - 3 >= r1)
                    w = w.substring(0, w.length - 3) + "eux"
                } else if ((w.endsWith("abl") || w.endsWith("iqU")) &&
                  w.length - 3 >= r2)
                  w = w.substring(0, w.length - 3)
                else if ((w.endsWith("ièr") || w.endsWith("Ièr")) &&
                  w.length - 3 >= rv)
                  w = w.substring(0, w.length - 3) + "i"
              }
            case "ité" | "ités" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("abil")) {
                  if (w.length - 4 >= r2) w = w.substring(0, w.length - 4)
                  else w = w.substring(0, w.length - 4) + "abl"
                } else if (w.endsWith("ic")) {
                  if (w.length - 2 >= r2) w = w.substring(0, w.length - 2)
                  else w = w.substring(0, w.length - 2) + "iqU"
                } else if (w.endsWith("iv") && w.length - 2 >= r2)
                  w = w.substring(0, w.length - 2)
              }
            case "if" | "ive" | "ifs" | "ives" =>
              if (st >= r2) {
                w = w.substring(0, st)
                if (w.endsWith("at") && w.length - 2 >= r2) {
                  w = w.substring(0, w.length - 2)
                  if (w.endsWith("ic")) {
                    if (w.length - 2 >= r2) w = w.substring(0, w.length - 2)
                    else w = w.substring(0, w.length - 2) + "iqU"
                  }
                }
              }
            case "eaux" => w = w.substring(0, st) + "eau"
            case "aux" =>
              if (st >= r1) w = w.substring(0, st) + "al"
            case "euse" | "euses" =>
              if (st >= r2) w = w.substring(0, st)
              else if (st >= r1) w = w.substring(0, st) + "eux"
            case "issement" | "issements" =>
              if (st >= r1 && st >= 1 && !isV(w.charAt(st - 1)))
                w = w.substring(0, st)
            case "amment" =>
              if (st >= rv) { w = w.substring(0, st) + "ant"; mentFound = true }
            case "emment" =>
              if (st >= rv) { w = w.substring(0, st) + "ent"; mentFound = true }
            case "ment" | "ments" =>
              if (st >= 1 && st - 1 >= rv && isV(w.charAt(st - 1))) {
                w = w.substring(0, st); mentFound = true
              }
            case _ =>
          }
        case None =>
      }

      var lastAltered = w != before1
      if (w == before1 || mentFound) {
        // step 2a: verb suffixes in i (match limited to RV), preceded
        // by a non-vowel other than H in RV (the 2.x H-guard keeps a
        // Hi-masked ï from acting as the required consonant: 'haïr'
        // stays 'haïr')
        val before2a = w
        longestIn(w, rv, step2a) match {
          case Some(s) =>
            val st = w.length - s.length
            if (st - 1 >= rv && !isV(w.charAt(st - 1)) &&
              w.charAt(st - 1) != 'H')
              w = w.substring(0, st)
          case None =>
        }
        lastAltered = w != before2a
        if (!lastAltered) {
          // step 2b (match limited to RV; 'ions' additionally R2)
          val before2b = w
          longestIn(w, rv, step2bAll) match {
            case Some("ions") =>
              if (w.length - 4 >= r2) w = w.substring(0, w.length - 4)
            case Some(s) if step2bE.contains(s) =>
              w = w.substring(0, w.length - s.length)
            case Some(s) =>
              w = w.substring(0, w.length - s.length)
              if (w.nonEmpty && w.charAt(w.length - 1) == 'e' &&
                w.length - 1 >= rv)
                w = w.substring(0, w.length - 1)
            case None =>
          }
          lastAltered = w != before2b
        }
      }

      if (lastAltered) {
        // step 3
        if (w.endsWith("Y")) w = w.substring(0, w.length - 1) + "i"
        else if (w.endsWith("ç")) w = w.substring(0, w.length - 1) + "c"
      } else {
        // step 4: final s drops unless preceded by a/i/o/u/è/s — with
        // the 2.x exception that s after a Hi-masked ï DOES drop
        // ('haïs' → haHis → haHi → 'haï'); then the residual among,
        // matched within RV (the old 'ë'('gu') entry is gone — ë is
        // He by the time step 4 runs)
        if (w.endsWith("s") && w.length >= 2 &&
          (w.endsWith("His") ||
            "aiouès".indexOf(w.charAt(w.length - 2)) < 0))
          w = w.substring(0, w.length - 1)
        longestIn(w, rv, byLen("ion", "ier", "ière", "Ier", "Ière", "e")) match {
          case Some("ion") =>
            val st = w.length - 3
            if (st >= r2 && st - 1 >= rv &&
              (w.charAt(st - 1) == 's' || w.charAt(st - 1) == 't'))
              w = w.substring(0, st)
          case Some(s @ ("ier" | "ière" | "Ier" | "Ière")) =>
            w = w.substring(0, w.length - s.length) + "i"
          case Some("e") =>
            w = w.substring(0, w.length - 1)
          case _ =>
        }
      }

      // step 5: undouble
      if (w.endsWith("enn") || w.endsWith("onn") || w.endsWith("ett") ||
        w.endsWith("ell") || w.endsWith("eill"))
        w = w.substring(0, w.length - 1)
      // step 6: un-accent é/è followed only by non-vowels to the end
      locally {
        var j = w.length - 1
        while (j >= 0 && !isV(w.charAt(j))) j -= 1
        if (j >= 0 && j < w.length - 1 &&
          (w.charAt(j) == 'é' || w.charAt(j) == 'è'))
          w = w.substring(0, j) + "e" + w.substring(j + 1)
      }
      // postlude: unmark I/U/Y; restore a still-intact He/Hi to ë/ï;
      // delete a bare H left behind when its e/i was stripped
      val out = new java.lang.StringBuilder(w.length)
      var k = 0
      while (k < w.length) {
        w.charAt(k) match {
          case 'I' => out.append('i'); k += 1
          case 'U' => out.append('u'); k += 1
          case 'Y' => out.append('y'); k += 1
          case 'H' =>
            if (k + 1 < w.length && w.charAt(k + 1) == 'e') {
              out.append('ë'); k += 2
            } else if (k + 1 < w.length && w.charAt(k + 1) == 'i') {
              out.append('ï'); k += 2
            } else k += 1
          case c => out.append(c); k += 1
        }
      }
      out.toString
    }
  }

  // ===================================================================
  // Scandinavian family (Danish / Norwegian / Swedish) — r11.
  //
  // These three share the Snowball structure: R1 (min-3 prefix), a
  // step-1 ending table, a consonant-pair step that drops the final
  // letter, and a step-3 d-suffix table. CRUCIALLY their step tables
  // run under Snowball's `setlimit tomark p1`: matching itself is
  // RESTRICTED to R1, so a long ending that starts before R1 does not
  // match and a SHORTER fitting ending wins instead (hedens → hed via
  // 'ens', not a failed 'hedens') — unlike the German/Romance
  // longest-match-then-test style above. `longestIn` implements that.
  // ===================================================================

  /** Longest suffix of `w` from `sufs` (sorted length-descending)
    * whose start offset is >= `r1` — Snowball's setlimit-to-R1
    * matching, where endings longer than the R1 window simply do not
    * participate. */
  private def longestIn(w: String, r1: Int, sufs: Seq[String]): Option[String] =
    sufs.find(s => w.endsWith(s) && w.length - s.length >= r1)

  object Danish {
    private val vowels = "aeiouyæåø"
    private def isV(c: Char) = vowels.indexOf(c) >= 0
    private val sEnding = "abcdfghjklmnoprtvyzå"
    private val step1 = byLen("hed", "ethed", "ered", "e", "erede", "ende",
      "erende", "ene", "erne", "ere", "en", "heden", "eren", "er", "heder",
      "erer", "heds", "es", "endes", "erendes", "enes", "ernes", "eres",
      "ens", "hedens", "erens", "ers", "ets", "erets", "et", "eret", "s")
    private val step3 = byLen("ig", "lig", "elig", "els", "løst")

    private def consonantPair(w: String, r1: Int): String =
      if (w.length >= 2 && w.length - 2 >= r1 &&
        Seq("gd", "dt", "gt", "kt").exists(w.endsWith))
        w.substring(0, w.length - 1)
      else w

    def stem(input: String): String = {
      var w = input
      val r1 = math.max(regionAfter(w, 0, isV), 3)
      // step 1 (main_suffix)
      longestIn(w, r1, step1) match {
        case Some("s") =>
          if (w.length >= 2 && sEnding.indexOf(w.charAt(w.length - 2)) >= 0)
            w = w.substring(0, w.length - 1)
        case Some(s) => w = w.substring(0, w.length - s.length)
        case None =>
      }
      // step 2 (consonant_pair)
      w = consonantPair(w, r1)
      // step 3 (other_suffix): unconditional igst → ig, then the table
      if (w.endsWith("igst")) w = w.substring(0, w.length - 2)
      longestIn(w, r1, step3) match {
        case Some("løst") => w = w.substring(0, w.length - 1)
        case Some(s) =>
          w = w.substring(0, w.length - s.length)
          w = consonantPair(w, r1)
        case None =>
      }
      // step 4 (undouble): final consonant in R1 equal to its
      // predecessor (only the final char need lie in R1)
      if (w.length >= 2 && w.length - 1 >= r1 && !isV(w.charAt(w.length - 1)) &&
        w.charAt(w.length - 1) == w.charAt(w.length - 2))
        w = w.substring(0, w.length - 1)
      w
    }
  }

  object Norwegian {
    private val vowels = "aeiouyæåø"
    private def isV(c: Char) = vowels.indexOf(c) >= 0
    private val sEnding = "bcdfghjlmnoprtvyz"
    private val step1 = byLen("a", "e", "ede", "ande", "ende", "ane", "ene",
      "hetene", "en", "heten", "ar", "er", "heter", "as", "es", "edes",
      "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets", "et",
      "het", "ast", "s", "erte", "ert")
    private val step3 = byLen("leg", "eleg", "ig", "eig", "lig", "elig",
      "els", "lov", "elov", "slov", "hetslov")

    def stem(input: String): String = {
      var w = input
      val r1 = math.max(regionAfter(w, 0, isV), 3)
      // step 1
      longestIn(w, r1, step1) match {
        case Some("s") =>
          // valid s-ending: the listed consonants, or k NOT preceded
          // by a vowel (norwegian.sbl s_ending: 'k' (non-v))
          val p = w.length - 2
          if (p >= 0 && (sEnding.indexOf(w.charAt(p)) >= 0 ||
            (w.charAt(p) == 'k' && (p == 0 || !isV(w.charAt(p - 1))))))
            w = w.substring(0, w.length - 1)
        case Some(s @ ("erte" | "ert")) =>
          w = w.substring(0, w.length - s.length) + "er"
        case Some(s) => w = w.substring(0, w.length - s.length)
        case None =>
      }
      // step 2 (consonant pair dt/vt: drop the final letter)
      if (w.length >= 2 && w.length - 2 >= r1 &&
        (w.endsWith("dt") || w.endsWith("vt")))
        w = w.substring(0, w.length - 1)
      // step 3
      longestIn(w, r1, step3).foreach(s =>
        w = w.substring(0, w.length - s.length))
      w
    }
  }

  object Swedish {
    private val vowels = "aeiouyäåö"
    private def isV(c: Char) = vowels.indexOf(c) >= 0
    private val sEnding = "bcdfghjklmnoprtvy"
    private val step1 = byLen("a", "arna", "erna", "heterna", "orna", "ad",
      "e", "ade", "ande", "arne", "are", "aste", "en", "anden", "aren",
      "heten", "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
      "ornas", "es", "ades", "andes", "ens", "arens", "hetens", "erns",
      "at", "andet", "het", "ast", "s")
    private val step3 = byLen("lig", "ig", "els", "löst", "fullt")

    def stem(input: String): String = {
      var w = input
      val r1 = math.max(regionAfter(w, 0, isV), 3)
      // step 1
      longestIn(w, r1, step1) match {
        case Some("s") =>
          if (w.length >= 2 && sEnding.indexOf(w.charAt(w.length - 2)) >= 0)
            w = w.substring(0, w.length - 1)
        case Some(s) => w = w.substring(0, w.length - s.length)
        case None =>
      }
      // step 2 (consonant pair: drop the final letter)
      if (w.length >= 2 && w.length - 2 >= r1 &&
        Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").exists(w.endsWith))
        w = w.substring(0, w.length - 1)
      // step 3
      longestIn(w, r1, step3) match {
        case Some("löst") => w = w.substring(0, w.length - 1)
        case Some("fullt") => w = w.substring(0, w.length - 1)
        case Some(s) => w = w.substring(0, w.length - s.length)
        case None =>
      }
      w
    }
  }

  // ===================================================================
  // Irish — r11. Converged against PostgreSQL 15's snowball irish_stem
  // to zero diffs across twelve fuzz seeds (~26,500 probe words plus a
  // structured grid). Structure recovered from probes: an initial-
  // mutation step (eclipsis bhf/mb/gc/nd/bp/ts/dt and lenition Ch→C,
  // plus the h-/n-/t- prefixes), then four suffix tiers — the
  // (a)íocht abstract-noun tier merged with the -amh/-bh/-mh noun
  // endings in ONE longest-match-then-test among (R1), the acht/ach
  // tier with lexical families (R2 for the acht family and -(a)irí,
  // RV for the arc/gin/graf/óid replacements, R2 for eachtúil), and a
  // verb tier whose imid/faidh group is RV-conditioned while
  // adh/tear/áil need R1. */
  // ===================================================================
  object Irish {
    private val vowels = "aeiouáéíóú"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    // initial_morph — the full 24-entry mutation among of irish.sbl
    // (exact tables r13, read out of PG's dict_snowball binary):
    // eclipsis/lenition prefixes strip or reduce to the radical.
    private val initial: Seq[(String, String)] = Seq(
      "b'" -> "", "d'" -> "", "m'" -> "", "h-" -> "", "n-" -> "", "t-" -> "",
      "d'fh" -> "f", "bhf" -> "f", "fh" -> "f",
      "sh" -> "s", "ts" -> "s",
      "bh" -> "b", "mb" -> "b", "ch" -> "c", "gc" -> "c",
      "dh" -> "d", "nd" -> "d", "gh" -> "g", "ng" -> "g",
      "bp" -> "p", "ph" -> "p", "dt" -> "t", "th" -> "t",
      "mh" -> "m").sortBy(-_._1.length)

    // noun_sfx: R1 delete, except ire/aire/irí/airí which are R2
    private val nounR2 = Set("ire", "aire", "irí", "airí")
    private val step1 = byLen("íochta", "aíochta", "ire", "aire",
      "abh", "eabh", "ibh", "aibh", "amh", "eamh", "imh", "aimh",
      "íocht", "aíocht", "irí", "airí")
    // deriv: (suffix, replacement, needsR2) — the slice_from
    // replacements are UNCONDITIONAL in the binary (no region test)
    private val step2: Seq[(String, String, Boolean)] = Seq(
      ("achta", "", true), ("eachta", "", true), ("ach", "", true),
      ("each", "", true), ("achtúil", "", true), ("eachtúil", "", true),
      ("acht", "", true), ("eacht", "", true),
      ("arcachtaí", "arc", false), ("arcachta", "arc", false),
      ("arcacht", "arc", false),
      ("gineach", "gin", false), ("gineas", "gin", false),
      ("ginis", "gin", false),
      ("grafaíochtaí", "graf", false), ("grafaíochta", "graf", false),
      ("grafaíocht", "graf", false), ("grafaíoch", "graf", false),
      ("patacha", "paite", false), ("patach", "paite", false),
      ("pataigh", "paite", false), ("paite", "paite", false),
      ("óideacha", "óid", false), ("óideach", "óid", false),
      ("óidigh", "óid", false))
      .sortBy(-_._1.length)
    private val verbRv = byLen("imid", "aimid", "ímid", "aímid", "faidh", "fidh")
    private val verbR1 = byLen("adh", "eadh", "áil", "ain", "tear", "tar")
    private val verbAll = byLen((verbRv ++ verbR1): _*)

    def stem(input: String): String = {
      var w = input
      initial.find(p => w.startsWith(p._1)).foreach { case (pat, rep) =>
        w = rep + w.substring(pat.length)
      }
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = {
        var i = 0
        while (i < w.length && !isV(w.charAt(i))) i += 1
        if (i < w.length) i + 1 else w.length
      }
      longest(w, step1).foreach { s =>
        val r = if (nounR2.contains(s)) r2 else r1
        if (w.length - s.length >= r) w = w.substring(0, w.length - s.length)
      }
      step2.find(e => w.endsWith(e._1)).foreach { case (pat, rep, needsR2) =>
        if (!needsR2 || w.length - pat.length >= r2)
          w = w.substring(0, w.length - pat.length) + rep
      }
      longest(w, verbAll).foreach { s =>
        val r = if (verbRv.contains(s)) rv else r1
        if (w.length - s.length >= r) w = w.substring(0, w.length - s.length)
      }
      w
    }
  }

  // ===================================================================
  // Romanian — r11. Implemented from the published algorithm and
  // CONVERGED against PostgreSQL 15's snowball romanian_stem on a
  // ~7,800-word probe corpus (structured base×suffix grid + two fuzz
  // rounds, zero diffs) — the same compiled tables the reference's
  // lucene RomanianStemmer was generated from. Notable semantics the
  // probes pinned: steps 0-2 are longest-match-THEN-test (a long
  // ending outside R1/R2 blocks shorter ones), the verb step is
  // setlimit-to-RV (an ending that does not fit the RV window falls
  // back to a shorter one) with one shared precondition (preceded in
  // RV by a non-vowel or 'u') for all but the person/sigmatic
  // endings, and the suffix tables use the CEDILLA forms ş/ţ (the
  // comma-below ș/ț spellings pass through unstemmed, as in the
  // reference). */
  // ===================================================================
  object Romanian {
    private val vowels = "aăâeiîou"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val step0 = byLen("ul", "ului", "ea", "ele", "elor", "ii", "iei",
      "iile", "iilor", "ilor", "ile", "atei", "aţie", "aţia")
    private val combo: Seq[(Seq[String], String)] = Seq(
      (byLen("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
      (byLen("ibilitate"), "ibil"),
      (byLen("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
      (byLen("icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
        "iciv", "iciva", "icive", "icivi", "icivă", "ical", "icala", "icale",
        "icali", "icală"), "ic"),
      (byLen("ativ", "ativa", "ative", "ativi", "ativă", "aţiune", "atoare",
        "ator", "atori", "ătoare", "ător", "ători"), "at"),
      (byLen("itiv", "itiva", "itive", "itivi", "itivă", "iţiune", "itoare",
        "itor", "itori"), "it"))
    private val comboAll = byLen(combo.flatMap(_._1): _*)
    private val stdDel = byLen("at", "ata", "ată", "ati", "ate", "ut", "uta",
      "ută", "uti", "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica",
      "ice", "ici", "ică", "abil", "abila", "abile", "abili", "abilă",
      "ibil", "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă", "oase",
      "os", "osi", "oşi", "ant", "anta", "ante", "anti", "antă", "ator",
      "atori", "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive", "ivi",
      "ivă")
    private val stdIune = byLen("iune", "iuni")
    private val stdIst = byLen("ism", "isme", "ist", "ista", "iste", "isti",
      "istă", "işti")
    private val stdAll = byLen((stdDel ++ stdIune ++ stdIst): _*)
    private val verbUncond = byLen("em", "im", "âm", "ăm", "aţi", "eţi",
      "iţi", "âţi", "sei", "se", "seşi", "seră", "serăm", "serăţi", "sese",
      "seseşi", "seseră", "seserăm", "seserăţi", "sesem")
    private val verbCond = byLen("are", "ere", "ire", "âre", "ind", "ând",
      "indu", "ându", "eze", "ească", "ez", "ezi", "ează", "esc", "eşti",
      "eşte", "ăsc", "ăşti", "ăşte", "am", "ai", "au", "eam", "eai", "ea",
      "eaţi", "eau", "iam", "iai", "ia", "iaţi", "iau", "ui", "âi", "aşi", "arăm",
      "arăţi", "ară", "uşi", "urăm", "urăţi", "ură", "işi", "irăm", "irăţi",
      "iră", "âşi", "ârăm", "ârăţi", "âră", "asem", "aseşi", "ase", "aserăm",
      "aserăţi", "aseră", "isem", "iseşi", "ise", "iserăm", "iserăţi",
      "iseră", "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră", "usem",
      "useşi", "use", "userăm", "userăţi", "useră")
    private val verbAll = byLen((verbUncond ++ verbCond): _*)
    private val finalVowel = byLen("a", "e", "i", "ie", "ă")

    /** Longest matching suffix, accepted only if it starts in region
      * `r` — snowball's then-test (no shorter fallback). */
    private def longestTest(w: String, r: Int, sufs: Seq[String]): Option[String] =
      sufs.find(w.endsWith).filter(s => w.length - s.length >= r)

    def stem(input: String): String = {
      val sb = new java.lang.StringBuilder(input)
      var i = 1
      while (i < sb.length - 1) {
        val c = sb.charAt(i)
        if ((c == 'i' || c == 'u') && isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
          sb.setCharAt(i, Character.toUpperCase(c))
        i += 1
      }
      var w = sb.toString
      val rv = rvRomance(w, isV)
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      // step 0 (articles/plurals, R1, then-test)
      longestTest(w, r1, step0).foreach {
        case s @ ("ul" | "ului") => w = w.substring(0, w.length - s.length)
        case s @ ("ea" | "ele" | "elor") =>
          w = w.substring(0, w.length - s.length) + "e"
        case s @ ("ii" | "iei" | "iile" | "iilor" | "ilor") =>
          w = w.substring(0, w.length - s.length) + "i"
        case "ile" =>
          if (!w.substring(0, w.length - 3).endsWith("ab"))
            w = w.substring(0, w.length - 3) + "i"
        case "atei" => w = w.substring(0, w.length - 4) + "at"
        case s => w = w.substring(0, w.length - s.length) + "aţi" // aţie/aţia
      }
      // step 1 (combining suffixes, R1, repeat)
      var removed = false
      var more = true
      while (more) {
        longestTest(w, r1, comboAll) match {
          case Some(s) =>
            val rep = combo.find(_._1.contains(s)).get._2
            w = w.substring(0, w.length - s.length) + rep
            removed = true
          case None => more = false
        }
      }
      // step 2 (standard suffixes, R2, then-test)
      longestTest(w, r2, stdAll).foreach { s =>
        if (stdDel.contains(s)) { w = w.substring(0, w.length - s.length); removed = true }
        else if (stdIune.contains(s)) {
          if (w.substring(0, w.length - s.length).endsWith("ţ")) {
            w = w.substring(0, w.length - s.length - 1) + "t"; removed = true
          }
        } else { w = w.substring(0, w.length - s.length) + "ist"; removed = true }
      }
      // step 3 (verb suffixes, RV window with shorter-suffix fallback,
      // only when steps 1-2 removed nothing)
      if (!removed) {
        longestIn(w, rv, verbAll).foreach { s =>
          val st = w.length - s.length
          if (verbUncond.contains(s)) w = w.substring(0, st)
          else if (st - 1 >= rv && (!isV(w.charAt(st - 1)) || w.charAt(st - 1) == 'u'))
            w = w.substring(0, st)
        }
      }
      // step 4 (final vowel, RV, then-test)
      longestTest(w, rv, finalVowel).foreach(s =>
        w = w.substring(0, w.length - s.length))
      w.replace('I', 'i').replace('U', 'u')
    }
  }

  // ===================================================================
  // Russian — r11. The published algorithm works on lowercase
  // Cyrillic with ё pre-mapped to е. The whole stemmer body runs
  // under `backwards setlimit tomark pV` — EVERY suffix match and
  // every group-1 а/я precondition is confined to RV (the region
  // after the first vowel); class order is perfective-gerund, else
  // (optional reflexive, then adjectival | verb | noun first-match),
  // then и-removal, the R2 derivational tier, and the нн/superlative/ь
  // tidy-up. Within a class the match is longest-first across both
  // condition groups with no fallback on a failed а/я test.
  // ===================================================================
  object Russian {
    private val vowels = "аеиоуыэюя"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val perfGerund1 = byLen("в", "вши", "вшись")
    private val perfGerund2 = byLen("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
    private val perfGerund = byLen((perfGerund1 ++ perfGerund2): _*)
    private val adjective = byLen("ее", "ие", "ые", "ое", "ими", "ыми", "ей",
      "ий", "ый", "ой", "ем", "им", "ым", "ом", "его", "ого", "ему", "ому",
      "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
    private val participle1 = byLen("ем", "нн", "вш", "ющ", "щ")
    private val participle2 = byLen("ивш", "ывш", "ующ")
    private val participle = byLen((participle1 ++ participle2): _*)
    private val verb1 = byLen("ла", "на", "ете", "йте", "ли", "й", "л", "ем",
      "н", "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")
    private val verb2 = byLen("ила", "ыла", "ена", "ейте", "уйте", "ите",
      "или", "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
      "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь",
      "ую", "ю")
    private val verb = byLen((verb1 ++ verb2): _*)
    private val noun = byLen("а", "ев", "ов", "ие", "ье", "е", "иями", "ями",
      "ами", "еи", "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям",
      "ием", "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
      "ью", "ю", "ия", "ья", "я")
    private val superlative = byLen("ейш", "ейше")

    def stem(input: String): String = {
      var w = input.replace('ё', 'е')
      val rv = {
        var i = 0
        while (i < w.length && !isV(w.charAt(i))) i += 1
        if (i < w.length) i + 1 else w.length
      }
      val r1raw = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1raw, isV)

      // a group-1 suffix additionally needs а/я immediately before it,
      // with that char itself inside RV (the setlimit covers it too)
      def g1ok(st: Int): Boolean =
        st - 1 >= rv && (w.charAt(st - 1) == 'а' || w.charAt(st - 1) == 'я')
      def dropIn(sufs: Seq[String], g1: Seq[String]): Boolean =
        longestIn(w, rv, sufs) match {
          case Some(s) =>
            val st = w.length - s.length
            if (!g1.contains(s) || g1ok(st)) { w = w.substring(0, st); true }
            else false
          case None => false
        }

      // step 1
      if (!dropIn(perfGerund, perfGerund1)) {
        longestIn(w, rv, byLen("ся", "сь")).foreach(s =>
          w = w.substring(0, w.length - s.length))
        val adj = longestIn(w, rv, adjective) match {
          case Some(s) =>
            w = w.substring(0, w.length - s.length)
            dropIn(participle, participle1)
            true
          case None => false
        }
        if (!adj && !dropIn(verb, verb1)) dropIn(noun, Nil)
      }
      // step 2
      if (w.endsWith("и") && w.length - 1 >= rv)
        w = w.substring(0, w.length - 1)
      // step 3 (derivational, in R2)
      longestIn(w, math.max(r2, rv), byLen("ост", "ость")).foreach(s =>
        w = w.substring(0, w.length - s.length))
      // step 4 (tidy up; the setlimit makes both chars of нн sit in RV)
      if (w.endsWith("нн") && w.length - 2 >= rv)
        w = w.substring(0, w.length - 1)
      else longestIn(w, rv, superlative) match {
        case Some(s) =>
          w = w.substring(0, w.length - s.length)
          if (w.endsWith("нн") && w.length - 2 >= rv)
            w = w.substring(0, w.length - 1)
        case None =>
          if (w.endsWith("ь") && w.length - 1 >= rv)
            w = w.substring(0, w.length - 1)
      }
      w
    }
  }

  // ===================================================================
  // Dutch — r11. Unlike the Scandinavian three, dutch.sbl tests R1/R2
  // INSIDE the among actions (longest match wins, then the region
  // test applies with no fallback), like the German/Romance stemmers.
  // ===================================================================
  object Dutch {
    private val vowels = "aeiouyè"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    /** kk/dd/tt lose their final letter after en/e removal. */
    private def undouble(w: String): String =
      if (w.endsWith("kk") || w.endsWith("dd") || w.endsWith("tt"))
        w.substring(0, w.length - 1)
      else w

    /** en/ene-ending condition: preceded by a non-vowel and the stem
      * does not end in "gem" at the cut. */
    private def enOk(w: String, st: Int): Boolean =
      st >= 1 && !isV(w.charAt(st - 1)) &&
        !(st >= 3 && w.substring(st - 3, st) == "gem")

    def stem(input: String): String = {
      // prelude: strip umlauts/acutes, then mark consonantal i/y —
      // initial y, y after a vowel, i between vowels — as upper case
      var w = input.map {
        case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
        case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
      }
      val sb = new java.lang.StringBuilder(w)
      if (sb.length > 0 && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == 'y' && isV(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        else if (c == 'i' && isV(sb.charAt(i - 1)) && i + 1 < sb.length &&
          isV(sb.charAt(i + 1))) sb.setCharAt(i, 'I')
        i += 1
      }
      w = sb.toString
      val r1raw = regionAfter(w, 0, isV)
      // the `$p1 < 3 -> $p1 = 3` floor in dutch.sbl counts BYTES (the
      // snowball runtime's cursor unit), so a 2-byte è within the
      // first two letters already satisfies it: PG stems 'ède'→'èd'
      // while 'ode' stays. Only an all-ASCII 2-char prefix triggers
      // the floor (r1raw >= 3 chars is always >= 3 bytes).
      val r1ModBytes = w.substring(0, math.min(r1raw, w.length))
        .foldLeft(0)((a, c) => a + (if (c < 0x80) 1 else if (c < 0x800) 2 else 3))
      val r1 = if (r1ModBytes >= 3) r1raw else 3
      val r2 = regionAfter(w, r1raw, isV)
      var eFound = false

      // step 1 — longest of heden / ene,en / se,s, then test
      longest(w, byLen("heden", "ene", "en", "se", "s")) match {
        case Some("heden") =>
          if (w.length - 5 >= r1) w = w.substring(0, w.length - 5) + "heid"
        case Some(s @ ("ene" | "en")) =>
          val st = w.length - s.length
          if (st >= r1 && enOk(w, st)) w = undouble(w.substring(0, st))
        case Some(s @ ("se" | "s")) =>
          val st = w.length - s.length
          if (st >= r1 && st >= 1 && !isV(w.charAt(st - 1)) &&
            w.charAt(st - 1) != 'j')
            w = w.substring(0, st)
        case _ =>
      }
      // step 2 — e-ending
      def eEnding(): Unit =
        if (w.endsWith("e") && w.length - 1 >= r1 && w.length >= 2 &&
          !isV(w.charAt(w.length - 2))) {
          w = undouble(w.substring(0, w.length - 1))
          eFound = true
        }
      eEnding()
      // step 3a — heid (not after c), then a second en pass
      if (w.endsWith("heid") && w.length - 4 >= r2 &&
        (w.length < 5 || w.charAt(w.length - 5) != 'c')) {
        w = w.substring(0, w.length - 4)
        if (w.endsWith("en") && w.length - 2 >= r1 && enOk(w, w.length - 2))
          w = undouble(w.substring(0, w.length - 2))
      }
      // step 3b — d-suffixes in R2
      longest(w, byLen("end", "ing", "ig", "lijk", "baar", "bar")) match {
        case Some(s @ ("end" | "ing")) =>
          val st = w.length - s.length
          if (st >= r2) {
            w = w.substring(0, st)
            if (w.endsWith("ig") && w.length - 2 >= r2 &&
              (w.length < 3 || w.charAt(w.length - 3) != 'e'))
              w = w.substring(0, w.length - 2)
            else w = undouble(w)
          }
        case Some("ig") =>
          val st = w.length - 2
          if (st >= r2 && (st == 0 || w.charAt(st - 1) != 'e'))
            w = w.substring(0, st)
        case Some("lijk") =>
          if (w.length - 4 >= r2) { w = w.substring(0, w.length - 4); eEnding() }
        case Some("baar") =>
          if (w.length - 4 >= r2) w = w.substring(0, w.length - 4)
        case Some("bar") =>
          if (w.length - 3 >= r2 && eFound) w = w.substring(0, w.length - 3)
        case _ =>
      }
      // step 4 — undouble vowel: ...C aa|ee|oo|uu D with D a
      // non-vowel other than I
      if (w.length >= 4) {
        val d = w.charAt(w.length - 1)
        val v2 = w.charAt(w.length - 2); val v1 = w.charAt(w.length - 3)
        val c = w.charAt(w.length - 4)
        if (!isV(d) && d != 'I' && v1 == v2 && "aeou".indexOf(v1) >= 0 &&
          !isV(c))
          w = w.substring(0, w.length - 2) + d
      }
      w.replace('I', 'i').replace('Y', 'y')
    }
  }

  // ===================================================================
  // Finnish — r12. CONVERGED against PostgreSQL 15's snowball
  // finnish_stem (the same compiled tables the reference's lucene
  // stemmer derives from; WordStemFunction.java:61): zero diffs on
  // ~23,000 probes (5 random fuzz seeds + a 10,488-word grid of real
  // Finnish bases × case/possessive/particle stacks + the PG stopword
  // vocabulary). Structure recovered by black-box probing:
  //  - amongs match longest-PATTERN within the R1 window (an entry
  //    whose full pattern crosses the region boundary simply cannot
  //    match, so a shorter entry wins), and a matched entry's
  //    preceded-by test failing fails the WHOLE among — no fallback
  //    (talohin stays talohin; dorfyiden falls to the 'n' entry only
  //    because 'Viden' cannot match, not because 'den' retried).
  //  - the Vi/LV-conditioned case endings (siin/den/tten, seen) carry
  //    their condition INSIDE the pattern ('Vi'+suffix, LV+'seen'),
  //    deleting only the ending part.
  //  - hXn case entries exist only for X ∈ {a,e,i,o,ä,ö} — hun/hyn
  //    resolve through the plain 'n' ending.
  object Finnish {
    private val vowels = "aeiouyäö"          // v
    private val restricted = "aeiouäö"       // V (no y)
    private def isV(c: Char) = vowels.indexOf(c) >= 0
    private val longVowels = Set("aa", "ee", "ii", "oo", "uu", "ää", "öö")

    /** Suffix pattern of n trailing chars lies fully within the region
      * starting at p. */
    private def fitsIn(w: String, p: Int, n: Int) = w.length - n >= p

    private def endsLong(w: String): Boolean =
      w.length >= 2 && longVowels.contains(w.substring(w.length - 2))

    private val particles =
      Seq("kaan", "kään", "kin", "han", "hän", "ko", "kö", "pa", "pä")

    private val casePlain =
      Seq("ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
        "na", "nä", "ksi", "ine", "ta", "tä")
    private val caseHxn = Map("han" -> 'a', "hen" -> 'e', "hin" -> 'i',
      "hon" -> 'o', "hän" -> 'ä', "hön" -> 'ö')

    def stem(input: String): String = {
      var w = lowerSimple(input)
      if (w.length < 2) return w
      val p1 = regionAfter(w, 0, isV)
      val p2 = regionAfter(w, p1, isV)

      // step 1: particle (preceded by n, t or a vowel) | sti (R2)
      {
        val part = particles.filter(s => w.endsWith(s) && fitsIn(w, p1, s.length))
        val sti = w.endsWith("sti") && fitsIn(w, p1, 3)
        val bestPart = if (part.nonEmpty) Some(part.maxBy(_.length)) else None
        if (bestPart.exists(s => !sti || s.length >= 3)) {
          val s = bestPart.get
          val i = w.length - s.length - 1
          if (i >= 0 && ("nt".indexOf(w.charAt(i)) >= 0 || isV(w.charAt(i))))
            w = w.substring(0, w.length - s.length)
        } else if (sti && fitsIn(w, p2, 3)) w = w.substring(0, w.length - 3)
      }

      // step 2: possessive
      {
        val ends = Seq("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
        ends.filter(s => w.endsWith(s) && fitsIn(w, p1, s.length))
          .sortBy(-_.length).headOption match {
          case Some(s) =>
            val stem0 = w.substring(0, w.length - s.length)
            s match {
              case "nsa" | "nsä" | "mme" | "nne" => w = stem0
              case "si" => if (!stem0.endsWith("k")) w = stem0
              case "ni" =>
                w = if (stem0.endsWith("kse")) stem0.dropRight(1) + "i" else stem0
              case "an" =>
                if (Seq("ta", "ssa", "sta", "lla", "lta", "na").exists(stem0.endsWith))
                  w = stem0
              case "än" =>
                if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä").exists(stem0.endsWith))
                  w = stem0
              case "en" =>
                if (Seq("lle", "ine").exists(stem0.endsWith)) w = stem0
              case _ =>
            }
          case None =>
        }
      }

      // step 3: case endings — candidates as (patternLen, deleteLen, tag)
      var caseRemoved = false
      locally {
        var best: Option[(Int, Int, String, String)] = None
        def offer(patLen: Int, delLen: Int, tag: String, s: String): Unit =
          if (best.forall(_._1 < patLen)) best = Some((patLen, delLen, tag, s))
        for (s <- caseHxn.keys)
          if (w.endsWith(s) && fitsIn(w, p1, 3)) offer(3, 3, "hxn", s)
        for (s <- Seq("siin", "tten", "den"))
          if (w.endsWith(s) && fitsIn(w, p1, s.length + 2)) {
            val i = w.length - s.length
            if (i >= 2 && w.charAt(i - 1) == 'i' &&
              restricted.indexOf(w.charAt(i - 2)) >= 0)
              offer(s.length + 2, s.length, "plain", s)
          }
        if (w.endsWith("seen") && fitsIn(w, p1, 6) &&
          longVowels.contains(w.substring(w.length - 6, w.length - 4)))
          offer(6, 4, "plain", "seen")
        for (s <- Seq("tta", "ttä"))
          if (w.endsWith(s) && fitsIn(w, p1, 3)) offer(3, 3, "tta", s)
        for (s <- casePlain)
          if (w.endsWith(s) && fitsIn(w, p1, s.length))
            offer(s.length, s.length, "plain", s)
        for (s <- Seq("a", "ä"))
          if (w.endsWith(s) && fitsIn(w, p1, 2) && w.length >= 3 &&
            isV(w.charAt(w.length - 2)) && !isV(w.charAt(w.length - 3)))
            offer(3, 1, "plain", s)
        if (w.endsWith("n") && fitsIn(w, p1, 1)) offer(1, 1, "n", "n")
        best match {
          case Some((_, delLen, tag, s)) => tag match {
            case "hxn" =>
              val i = w.length - 4
              if (i >= p1 && i >= 0 && w.charAt(i) == caseHxn(s)) {
                w = w.substring(0, w.length - 3); caseRemoved = true
              }
            case "tta" =>
              val i = w.length - 4
              if (i >= p1 && i >= 0 && w.charAt(i) == 'e') {
                w = w.substring(0, w.length - 3); caseRemoved = true
              }
            case "n" =>
              w = w.dropRight(1)
              if (endsLong(w) || w.endsWith("ie")) w = w.dropRight(1)
              caseRemoved = true
            case _ =>
              w = w.substring(0, w.length - delLen); caseRemoved = true
          }
          case None =>
        }
      }

      // step 4: other endings (R2)
      {
        val imm = Seq("impi", "impa", "impä", "immi", "imma", "immä")
        val mm = Seq("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
        if (imm.exists(s => w.endsWith(s) && fitsIn(w, p2, 4)))
          w = w.dropRight(4)
        else mm.find(s => w.endsWith(s) && fitsIn(w, p2, 3)) match {
          case Some(_) => if (!w.dropRight(3).endsWith("po")) w = w.dropRight(3)
          case None =>
            if (Seq("eja", "ejä").exists(s => w.endsWith(s) && fitsIn(w, p2, 3)))
              w = w.dropRight(3)
        }
      }

      // step 5: plurals
      if (caseRemoved) {
        if ((w.endsWith("i") || w.endsWith("j")) && fitsIn(w, p1, 1))
          w = w.dropRight(1)
      } else if (w.endsWith("t") && fitsIn(w, p1, 1) && w.length >= 2 &&
        isV(w.charAt(w.length - 2))) {
        w = w.dropRight(1)
        if (w.endsWith("imma") && fitsIn(w, p2, 4)) w = w.dropRight(4)
        else if (w.endsWith("mma") && fitsIn(w, p2, 3) &&
          !w.dropRight(3).endsWith("po")) w = w.dropRight(3)
      }

      // step 6: tidy
      if (endsLong(w) && fitsIn(w, p1, 1)) w = w.dropRight(1)
      if (w.length >= 2 && "aäei".indexOf(w.charAt(w.length - 1)) >= 0 &&
        !isV(w.charAt(w.length - 2)) && fitsIn(w, p1, 2)) w = w.dropRight(1)
      if ((w.endsWith("oj") || w.endsWith("uj")) && fitsIn(w, p1, 1))
        w = w.dropRight(1)
      if (w.endsWith("jo") && fitsIn(w, p1, 2)) w = w.dropRight(1)
      // undouble a final double consonant followed by zero or more vowels
      var i = w.length - 1
      while (i >= 0 && isV(w.charAt(i))) i -= 1
      if (i >= 1 && !isV(w.charAt(i)) && w.charAt(i) == w.charAt(i - 1))
        w = w.substring(0, i) + w.substring(i + 1)
      w
    }
  }

  // Hungarian — REWRITTEN r13 as an exact transcription of the
  // snowball algorithm compiled into PG 15's dict_snowball (among
  // tables + control flow read out of the binary with
  // scripts/stemfit/so_extract.py; reference model hu_exact.py,
  // 0 diffs on 140k-word live-PG fuzz). The r12 black-box port
  // over-stripped stacked vowel endings ('...éé', '...áéi') because
  // it missed that the plur_owner/owned/owner/plural steps CHAIN,
  // each folding a remaining final á/é to a/e before the next step
  // re-matches.
  object Hungarian {
    private val vowels = "aeiouáéíóöúüőű"
    private def isV(c: Char) = vowels.indexOf(c) >= 0
    private val digraphs = byLen("cs", "dzs", "gy", "ly", "ny", "sz", "ty", "zs")
    private val doubles = byLen("bb", "cc", "ccs", "dd", "ff", "gg", "ggy",
      "jj", "kk", "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz",
      "tt", "tty", "vv", "zz", "zzs")

    private val huCase: Seq[(String, Int)] = Seq(
      ("képpen", -1), ("anként", -1), ("enként", -1), ("onként", -1), ("képp", -1),
      ("ként", -1), ("nak", -1), ("nek", -1), ("val", -1), ("vel", -1),
      ("ből", -1), ("ről", -1), ("től", -1), ("nál", -1), ("nél", -1),
      ("ból", -1), ("ról", -1), ("tól", -1), ("ban", -1), ("ben", -1),
      ("kor", -1), ("ért", -1), ("hez", -1), ("hoz", -1), ("höz", -1),
      ("ba", -1), ("ra", -1), ("be", -1), ("re", -1), ("ig", -1),
      ("ul", -1), ("ül", -1), ("an", -1), ("en", -1), ("on", -1),
      ("ön", -1), ("at", -1), ("et", -1), ("ot", -1), ("öt", -1),
      ("vá", -1), ("vé", -1), ("n", -1), ("t", -1))

    private val huCaseSpecial: Seq[(String, Int)] = Seq(
      ("ánként", 2), ("án", 2), ("én", 1))

    private val huCaseOther: Seq[(String, Int)] = Seq(
      ("astul", 1), ("ástul", 2), ("estül", 1), ("éstül", 3), ("stul", 1),
      ("stül", 1))

    private val huPlurOwner: Seq[(String, Int)] = Seq(
      ("áéi", 3), ("ééi", 2), ("aké", 1), ("eké", 1), ("oké", 1),
      ("áké", 3), ("éké", 2), ("öké", 1), ("éi", 1), ("ké", 1),
      ("éé", 2), ("é", 1))

    private val huOwned: Seq[(String, Int)] = Seq(
      ("ájuk", 2), ("éjük", 3), ("unk", 1), ("ánk", 2), ("énk", 3),
      ("ünk", 1), ("juk", 1), ("jük", 1), ("ja", 1), ("ad", 1),
      ("ed", 1), ("od", 1), ("ád", 2), ("éd", 3), ("öd", 1),
      ("je", 1), ("nk", 1), ("uk", 1), ("ük", 1), ("am", 1),
      ("em", 1), ("om", 1), ("ám", 2), ("ém", 3), ("a", 1),
      ("d", 1), ("e", 1), ("m", 1), ("o", 1), ("á", 2),
      ("é", 3))

    private val huOwner: Seq[(String, Int)] = Seq(
      ("jeitek", 1), ("jaitok", 1), ("eitek", 1), ("éitek", 3), ("jaink", 1),
      ("jeink", 1), ("aitok", 1), ("áitok", 2), ("jaid", 1), ("jeid", 1),
      ("itek", 1), ("jaik", 1), ("jeik", 1), ("aink", 1), ("eink", 1),
      ("áink", 2), ("éink", 3), ("jaim", 1), ("jeim", 1), ("aid", 1),
      ("eid", 1), ("áid", 2), ("éid", 3), ("jai", 1), ("jei", 1),
      ("aik", 1), ("eik", 1), ("áik", 2), ("éik", 3), ("ink", 1),
      ("aim", 1), ("eim", 1), ("áim", 2), ("éim", 3), ("id", 1),
      ("ai", 1), ("ei", 1), ("ái", 2), ("éi", 3), ("ik", 1),
      ("im", 1), ("i", 1))

    private val huPlural: Seq[(String, Int)] = Seq(
      ("ak", 3), ("ek", 3), ("ok", 3), ("ák", 1), ("ék", 2),
      ("ök", 3), ("k", 3))

    private def isDouble(s: String) = doubles.exists(s.endsWith)
    /** Remove the second-to-last character (one half of the double;
      * for digraph doubles like 'ssz' this leaves the digraph). */
    private def undouble(s: String) = s.substring(0, s.length - 2) + s.last

    def stem(input: String): String = {
      var w = lowerSimple(input)
      val n = w.length
      // p1: vowel-initial -> up to the first non-vowel, then past a
      // consonant digraph if one starts there, else past one char;
      // consonant-initial -> past the first vowel.
      val p1 = {
        if (n == 0) n
        else if (isV(w.charAt(0))) {
          var i = 0
          while (i < n && isV(w.charAt(i))) i += 1
          if (i >= n) n
          else digraphs.find(w.startsWith(_, i)) match {
            case Some(dg) => i + dg.length
            case None => i + 1
          }
        } else {
          var i = 0
          while (i < n && !isV(w.charAt(i))) i += 1
          if (i >= n) n else i + 1
        }
      }
      def find(table: Seq[(String, Int)]): Option[(String, Int)] =
        table.find(p => w.endsWith(p._1))
      def inR1(s: String) = w.length - s.length >= p1

      // instrum: al/el in R1 after a double consonant
      if ((w.endsWith("al") || w.endsWith("el")) && w.length - 2 >= p1 &&
        isDouble(w.substring(0, w.length - 2)))
        w = undouble(w.substring(0, w.length - 2))
      // case: delete, then fold a remaining final á/é (R1)
      find(huCase).foreach { case (s, _) =>
        if (inR1(s)) {
          w = w.substring(0, w.length - s.length)
          if (w.endsWith("á") && w.length - 1 >= p1)
            w = w.substring(0, w.length - 1) + "a"
          else if (w.endsWith("é") && w.length - 1 >= p1)
            w = w.substring(0, w.length - 1) + "e"
        }
      }
      // case_special: án/ánként -> a, én -> e (R1)
      find(huCaseSpecial).foreach { case (s, res) =>
        if (inR1(s))
          w = w.substring(0, w.length - s.length) + (if (res == 1) "e" else "a")
      }
      // case_other: stul/astul/stül/estül delete; ástul->a; éstül->e
      find(huCaseOther).foreach { case (s, res) =>
        if (inR1(s))
          w = w.substring(0, w.length - s.length) +
            (if (res == 1) "" else if (res == 2) "a" else "e")
      }
      // factive: á/é in R1 after a double consonant
      if ((w.endsWith("á") || w.endsWith("é")) && w.length - 1 >= p1 &&
        isDouble(w.substring(0, w.length - 1)))
        w = undouble(w.substring(0, w.length - 1))
      // plur_owner: delete / ->e / ->a  (note the e/a order differs
      // from the owned/owner steps below — so in the binary)
      find(huPlurOwner).foreach { case (s, res) =>
        if (inR1(s))
          w = w.substring(0, w.length - s.length) +
            (if (res == 1) "" else if (res == 2) "e" else "a")
      }
      // owned: delete / ->a / ->e
      find(huOwned).foreach { case (s, res) =>
        if (inR1(s))
          w = w.substring(0, w.length - s.length) +
            (if (res == 1) "" else if (res == 2) "a" else "e")
      }
      // owner: delete / ->a / ->e
      find(huOwner).foreach { case (s, res) =>
        if (inR1(s))
          w = w.substring(0, w.length - s.length) +
            (if (res == 1) "" else if (res == 2) "a" else "e")
      }
      // plural: ák->a, ék->e, k/ak/ek/ok/ök delete
      find(huPlural).foreach { case (s, res) =>
        if (inR1(s))
          w = w.substring(0, w.length - s.length) +
            (if (res == 1) "a" else if (res == 2) "e" else "")
      }
      w
    }
  }

  // ===================================================================
  // Turkish — r12. CONVERGED against PostgreSQL 15's snowball
  // turkish_stem (WordStemFunction.java:74): zero diffs on ~220,000
  // probes (18 fuzz seeds of syllable-shaped random words + a grid of
  // real Turkish stems × stacked case/possessive/copula suffixes + the
  // PG stopword vocabulary). Structure recovered by black-box probing:
  //  - vowel harmony ("check_vowel_harmony"): the last vowel at the
  //    check position must have SOME vowel of its harmony class
  //    anywhere to its left (snowball `goto` skips non-class chars,
  //    including other vowels) — fail when the word has no second
  //    vowel. Applied per-mark: ysA/yken/cAsInA/lArI/possessives skip
  //    it (lArI/cAsInA/sUnUz self-satisfy: both harmony vowels sit
  //    inside the suffix).
  //  - optional-letter marks: -(y)X consumes the 'y' only when a vowel
  //    precedes it; with no 'y' the char two left of the suffix must be
  //    a vowel (mirrored for -(n)-, -(s)-, and the -(U)- vowel whose
  //    second char must be a NON-vowel). Both branches failing fails
  //    the whole mark — no bare-suffix fallback (adamyken → adamyke).
  //  - the -(y)DU copula carries the personal endings as unit tails:
  //    DU(m|n|k)? in d- and t- forms (geldim→gel, hastaydım→has).
  //  - the verb-pass lAr branch ("geldiler") ends stemming entirely:
  //    no noun pass AND no postlude (kitablar→kitab, b not devoiced).
  //  - chain-after-ki entered via (ndA|nA) deletes its own slices but
  //    keeps the trailing case suffix (okultakinde→okulnde).
  //  - postlude: words stemmed to exactly "ad"/"soyad" are reserved
  //    (no postlude); otherwise a final d/g gets the harmony high
  //    vowel appended (yaddan→yadı), then a final b/c/d/ğ devoices to
  //    p/ç/t/k. A stem emptied by suffix removal yields the original
  //    word. Words with fewer than two vowels are never stemmed.
  //  - ORACLE-CHOICE DIVERGENCE, verbal -lAr: snowball's turkish
  //    stem() returns FALSE on that branch after mutating the buffer.
  //    PostgreSQL keeps the mutated buffer (ts_lexize returns the
  //    stemmed form), while the reference (Lucene 7.2.1 SnowballFilter
  //    via WordStemFunction) returns the INPUT unchanged when stem()
  //    is false. So word_stem('geldiler','tr') = 'gel' here (PG) but
  //    'geldiler' in the reference. We follow PG deliberately — it is
  //    the one black-box oracle every shipped language converged
  //    against (34k-word corpus, 18 fuzz seeds), and consistency
  //    across the 20 languages beats matching one engine's
  //    error-path quirk.
  object Turkish {
    private val vowels = "aeıioöuü"
    private val uVowels = "ıiuü"
    private def isV(c: Char) = vowels.indexOf(c) >= 0
    private val harmonyClass = Map('a' -> "aıou", 'e' -> "eiöü",
      'ı' -> "aı", 'i' -> "ei", 'o' -> "ou", 'ö' -> "öü",
      'u' -> "ou", 'ü' -> "öü")

    private def harmony(w: String, e: Int): Boolean = {
      var i = e - 1
      while (i >= 0 && !isV(w.charAt(i))) i -= 1
      if (i < 0) return false
      val allowed = harmonyClass(w.charAt(i))
      var j = i - 1
      while (j >= 0 && allowed.indexOf(w.charAt(j)) < 0) j -= 1
      j >= 0
    }

    /** -(c)- optional consonant: consume c when a vowel precedes it;
      * else require w(e-2) to be a vowel. -1 = mark fails. */
    private def optCons(w: String, e: Int, c: Char): Int =
      if (e >= 1 && w.charAt(e - 1) == c) {
        if (e >= 2 && isV(w.charAt(e - 2))) e - 1 else -1
      } else if (e >= 2 && isV(w.charAt(e - 2))) e
      else -1

    /** -(U)- optional high vowel: consume when a NON-vowel precedes. */
    private def optU(w: String, e: Int): Int =
      if (e >= 1 && uVowels.indexOf(w.charAt(e - 1)) >= 0) {
        if (e >= 2 && !isV(w.charAt(e - 2))) e - 1 else -1
      } else if (e >= 2 && !isV(w.charAt(e - 2))) e
      else -1

    /** Longest tail match (no fallthrough), then harmony + optional
      * letter. Returns the new end, or -1 if the mark fails. */
    private def mark(w: String, e: Int, tails: Seq[String],
        needHarmony: Boolean = true, opt: Char = ' '): Int = {
      if (needHarmony && !harmony(w, e)) return -1
      val t = tails.find(t => e >= t.length &&
        w.regionMatches(e - t.length, t, 0, t.length))
      t match {
        case None => -1
        case Some(s) =>
          val e2 = e - s.length
          opt match {
            case ' ' => e2
            case 'U' => optU(w, e2)
            case c => optCons(w, e2, c)
          }
      }
    }

    private def byLen(ss: Seq[String]) = ss.sortBy(-_.length)

    private val possTails = byLen(Seq("mız", "miz", "muz", "müz",
      "nız", "niz", "nuz", "nüz", "m", "n"))
    private val uTails = Seq("ı", "i", "u", "ü")
    private val lArITails = Seq("ları", "leri")
    private val nUTails = Seq("nı", "ni", "nu", "nü")
    private val nUnTails = Seq("ın", "in", "un", "ün")
    private val yATails = Seq("a", "e")
    private val nATails = Seq("na", "ne")
    private val dATails = Seq("da", "de", "ta", "te")
    private val ndATails = Seq("nda", "nde")
    private val dAnTails = Seq("dan", "den", "tan", "ten")
    private val ndAnTails = Seq("ndan", "nden")
    private val ylATails = Seq("la", "le")
    private val kiTails = Seq("ki")
    private val ncATails = Seq("ca", "ce")
    private val ykenTails = Seq("ken")
    private val cAsInATails = Seq("casına", "cesine")
    private val yDUTails = byLen(for {
      d <- Seq("d", "t"); v <- Seq("ı", "i", "u", "ü")
      p <- Seq("", "m", "n", "k")
    } yield d + v + p)
    private val ysATails = byLen(for {
      v <- Seq("a", "e"); p <- Seq("", "m", "n", "k")
    } yield "s" + v + p)
    private val ymUsTails = Seq("mış", "miş", "muş", "müş")
    private val sUnTails = Seq("sın", "sin", "sun", "sün")
    private val yUmTails = Seq("ım", "im", "um", "üm")
    private val yUzTails = Seq("ız", "iz", "uz", "üz")
    private val sUnUzTails = Seq("sınız", "siniz", "sunuz", "sünüz")
    private val lArTails = Seq("lar", "ler")
    private val nUzTails = Seq("nız", "niz", "nuz", "nüz")
    private val dUrTails = Seq("dır", "dir", "dur", "dür",
      "tır", "tir", "tur", "tür")

    private def mPoss(w: String, e: Int) =
      mark(w, e, possTails, needHarmony = false, opt = 'U')
    private def mSU(w: String, e: Int) = mark(w, e, uTails, opt = 's')
    private def mLArI(w: String, e: Int) =
      mark(w, e, lArITails, needHarmony = false)
    private def mYU(w: String, e: Int) = mark(w, e, uTails, opt = 'y')
    private def mYDU(w: String, e: Int) = mark(w, e, yDUTails, opt = 'y')
    private def mYsA(w: String, e: Int) =
      mark(w, e, ysATails, needHarmony = false, opt = 'y')
    private def mYmUs(w: String, e: Int) = mark(w, e, ymUsTails, opt = 'y')
    private def mYken(w: String, e: Int) =
      mark(w, e, ykenTails, needHarmony = false, opt = 'y')
    private def mCAsInA(w: String, e: Int) =
      mark(w, e, cAsInATails, needHarmony = false)
    private def mSUn(w: String, e: Int) = mark(w, e, sUnTails)
    private def mYUm(w: String, e: Int) = mark(w, e, yUmTails, opt = 'y')
    private def mYUz(w: String, e: Int) = mark(w, e, yUzTails, opt = 'y')
    private def mSUnUz(w: String, e: Int) =
      mark(w, e, sUnUzTails, needHarmony = false)
    private def mLAr(w: String, e: Int) = mark(w, e, lArTails)
    private def mNUz(w: String, e: Int) = mark(w, e, nUzTails)
    private def mDUr(w: String, e: Int) = mark(w, e, dUrTails)
    private def mNUn(w: String, e: Int) = mark(w, e, nUnTails, opt = 'n')
    private def mNcA(w: String, e: Int) = mark(w, e, ncATails, opt = 'n')
    private def mYA(w: String, e: Int) = mark(w, e, yATails, opt = 'y')
    private def mYlA(w: String, e: Int) = mark(w, e, ylATails, opt = 'y')
    private def mKi(w: String, e: Int) =
      mark(w, e, kiTails, needHarmony = false)
    private def mNA(w: String, e: Int) = mark(w, e, nATails)
    private def mDA(w: String, e: Int) = mark(w, e, dATails)
    private def mNdA(w: String, e: Int) = mark(w, e, ndATails)
    private def mDAn(w: String, e: Int) = mark(w, e, dAnTails)
    private def mNdAn(w: String, e: Int) = mark(w, e, ndAnTails)

    /** Nominal-verb pass. Returns (stripped word, run-noun-pass?); a
      * lAr match here ends stemming entirely (no noun pass, no
      * postlude). */
    private def verbPass(w: String): (String, Boolean) = {
      val e = w.length
      // A: ymUs | yDU(+personal) | ysA(+personal) | yken
      for (m <- Seq(mYmUs _, mYDU _, mYsA _, mYken _)) {
        val e2 = m(w, e)
        if (e2 >= 0) return (w.substring(0, e2), true)
      }
      // B: cAsInA (sUnUz|lAr|yUm|sUn|yUz|eps) ymUs — ymUs required
      locally {
        val e2 = mCAsInA(w, e)
        if (e2 >= 0) {
          var e3 = e2
          val mid = Seq(mSUnUz _, mLAr _, mYUm _, mSUn _, mYUz _)
            .iterator.map(_(w, e2)).find(_ >= 0)
          mid.foreach(r => e3 = r)
          val e4 = mYmUs(w, e3)
          if (e4 >= 0) return (w.substring(0, e4), true)
        }
      }
      // C: lAr ; delete ; try(DUr|yDU|ysA|ymUs) ; stop stemming
      locally {
        val e2 = mLAr(w, e)
        if (e2 >= 0) {
          var w2 = w.substring(0, e2)
          Seq(mDUr _, mYDU _, mYsA _, mYmUs _)
            .iterator.map(_(w2, w2.length)).find(_ >= 0)
            .foreach(r => w2 = w2.substring(0, r))
          return (w2, false)
        }
      }
      // D: nUz (yDU|ysA)
      locally {
        val e2 = mNUz(w, e)
        if (e2 >= 0) {
          for (m <- Seq(mYDU _, mYsA _)) {
            val r = m(w, e2)
            if (r >= 0) return (w.substring(0, r), true)
          }
        }
      }
      // E: (sUnUz|yUz|sUn|yUm) ; delete ; try ymUs
      for (m <- Seq(mSUnUz _, mYUz _, mSUn _, mYUm _)) {
        val e2 = m(w, e)
        if (e2 >= 0) {
          var w2 = w.substring(0, e2)
          val r = mYmUs(w2, w2.length)
          if (r >= 0) w2 = w2.substring(0, r)
          return (w2, true)
        }
      }
      // F: DUr ; delete ; try((sUnUz|lAr|yUm|sUn|yUz|eps) ymUs) — ymUs required
      locally {
        val e2 = mDUr(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          var e4 = w2.length
          Seq(mSUnUz _, mLAr _, mYUm _, mSUn _, mYUz _)
            .iterator.map(_(w2, w2.length)).find(_ >= 0)
            .foreach(r => e4 = r)
          val r = mYmUs(w2, e4)
          if (r >= 0) return (w2.substring(0, r), true)
          return (w2, true)
        }
      }
      (w, true)
    }

    /** ki chain: w must end ...ki; strips ki plus the case/possessive
      * tail before it. Returns null when ki (or what precedes) fails. */
    private def chainKi(w: String): String = {
      val e = mKi(w, w.length)
      if (e < 0) return null
      // alt 1: DA
      locally {
        val e2 = mDA(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val r = mLAr(w2, w2.length)
          if (r >= 0) {
            val w3 = w2.substring(0, r)
            val c = chainKi(w3)
            return if (c != null) c else w3
          }
          val rp = mPoss(w2, w2.length)
          if (rp >= 0) {
            val w3 = w2.substring(0, rp)
            val r2 = mLAr(w3, w3.length)
            if (r2 >= 0) {
              val w4 = w3.substring(0, r2)
              val c = chainKi(w4)
              return if (c != null) c else w4
            }
            return w3
          }
          return w2
        }
      }
      // alt 2: nUn
      locally {
        val e2 = mNUn(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val r = mLArI(w2, w2.length)
          if (r >= 0) return w2.substring(0, r)
          val rp = mPoss(w2, w2.length)
          if (rp >= 0) {
            val w3 = w2.substring(0, rp)
            val r2 = mLAr(w3, w3.length)
            if (r2 >= 0) {
              val w4 = w3.substring(0, r2)
              val c = chainKi(w4)
              return if (c != null) c else w4
            }
            return w3
          }
          val c = chainKi(w2)
          return if (c != null) c else w2
        }
      }
      // alt 3: ndA
      locally {
        val e2 = mNdA(w, e)
        if (e2 >= 0) {
          val r = mLArI(w, e2)
          if (r >= 0) return w.substring(0, r)
          val rs = mSU(w, e2)
          if (rs >= 0) {
            val w3 = w.substring(0, rs)
            val r2 = mLAr(w3, w3.length)
            if (r2 >= 0) {
              val w4 = w3.substring(0, r2)
              val c = chainKi(w4)
              return if (c != null) c else w4
            }
            return w3
          }
          return chainKi(w.substring(0, e2))
        }
      }
      null
    }

    private def tryLarKi(w: String): String = {
      val r = mLAr(w, w.length)
      if (r >= 0) {
        val w2 = w.substring(0, r)
        val c = chainKi(w2)
        if (c != null) c else w2
      } else w
    }

    /** lAr already stripped: continue with ki-chain, else possessive. */
    private def afterLar(w3: String): String = {
      val c = chainKi(w3)
      if (c != null) return c
      val r2 = mPoss(w3, w3.length)
      if (r2 >= 0) w3.substring(0, r2) else w3
    }

    private def nounPass(w: String): String = {
      val e = w.length
      // 1: lAr ; delete ; try chain_ki
      locally {
        val e2 = mLAr(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val c = chainKi(w2)
          return if (c != null) c else w2
        }
      }
      // 2: ncA ; delete ; try(lArI | (poss|sU)->try(lar ki) | lAr->ki)
      locally {
        val e2 = mNcA(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val r1 = mLArI(w2, w2.length)
          if (r1 >= 0) return w2.substring(0, r1)
          var r = mPoss(w2, w2.length)
          if (r < 0) r = mSU(w2, w2.length)
          if (r >= 0) return tryLarKi(w2.substring(0, r))
          val rl = mLAr(w2, w2.length)
          if (rl >= 0) {
            val w3 = w2.substring(0, rl)
            val c = chainKi(w3)
            return if (c != null) c else w3
          }
          return w2
        }
      }
      // 3: (ndA|nA) (lArI | sU->try(lar ki) | ki-chain keeping the tail)
      locally {
        var e2 = mNdA(w, e)
        if (e2 < 0) e2 = mNA(w, e)
        if (e2 >= 0) {
          val r1 = mLArI(w, e2)
          if (r1 >= 0) return w.substring(0, r1)
          val rs = mSU(w, e2)
          if (rs >= 0) return tryLarKi(w.substring(0, rs))
          val c = chainKi(w.substring(0, e2))
          if (c != null) return c + w.substring(e2)
        }
      }
      // 4: (ndAn|nU) (sU->try(lar ki) | lArI)
      locally {
        var e2 = mNdAn(w, e)
        if (e2 < 0) e2 = mNU(w, e)
        if (e2 >= 0) {
          val rs = mSU(w, e2)
          if (rs >= 0) return tryLarKi(w.substring(0, rs))
          val r1 = mLArI(w, e2)
          if (r1 >= 0) return w.substring(0, r1)
        }
      }
      // 5: DAn ; delete ; try(poss->try(lar ki) | lAr->ki | ki)
      locally {
        val e2 = mDAn(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val rp = mPoss(w2, w2.length)
          if (rp >= 0) return tryLarKi(w2.substring(0, rp))
          val rl = mLAr(w2, w2.length)
          if (rl >= 0) {
            val w3 = w2.substring(0, rl)
            val c = chainKi(w3)
            return if (c != null) c else w3
          }
          val c = chainKi(w2)
          if (c != null) return c
          return w2
        }
      }
      // 6: nUn ; delete ; try(sU->try(lar ki) | lArI | lAr->(ki|poss) | poss | ki)
      locally {
        val e2 = mNUn(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val rs = mSU(w2, w2.length)
          if (rs >= 0) return tryLarKi(w2.substring(0, rs))
          val r1 = mLArI(w2, w2.length)
          if (r1 >= 0) return w2.substring(0, r1)
          val rl = mLAr(w2, w2.length)
          if (rl >= 0) return afterLar(w2.substring(0, rl))
          val rp = mPoss(w2, w2.length)
          if (rp >= 0) return tryLarKi(w2.substring(0, rp))
          val c = chainKi(w2)
          if (c != null) return c
          return w2
        }
      }
      // 7: DA ; delete ; try(poss->try(lar ki) | lAr->ki)
      locally {
        val e2 = mDA(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val rp = mPoss(w2, w2.length)
          if (rp >= 0) return tryLarKi(w2.substring(0, rp))
          val rl = mLAr(w2, w2.length)
          if (rl >= 0) {
            val w3 = w2.substring(0, rl)
            val c = chainKi(w3)
            return if (c != null) c else w3
          }
          return w2
        }
      }
      // 8: ylA ; delete ; try((poss|sU)->try(lar ki) | lAr->(ki|poss) | ki)
      locally {
        val e2 = mYlA(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          var r = mPoss(w2, w2.length)
          if (r < 0) r = mSU(w2, w2.length)
          if (r >= 0) return tryLarKi(w2.substring(0, r))
          val rl = mLAr(w2, w2.length)
          if (rl >= 0) return afterLar(w2.substring(0, rl))
          val c = chainKi(w2)
          if (c != null) return c
          return w2
        }
      }
      // 9: yA ; delete ; try(lAr->ki | poss->try(lar ki))
      locally {
        val e2 = mYA(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val rl = mLAr(w2, w2.length)
          if (rl >= 0) {
            val w3 = w2.substring(0, rl)
            val c = chainKi(w3)
            return if (c != null) c else w3
          }
          val rp = mPoss(w2, w2.length)
          if (rp >= 0) return tryLarKi(w2.substring(0, rp))
          return w2
        }
      }
      // 10: lArI ; delete
      locally {
        val r = mLArI(w, e)
        if (r >= 0) return w.substring(0, r)
      }
      // 11: ki chain directly
      locally {
        val c = chainKi(w)
        if (c != null) return c
      }
      // 12: yU ; delete ; try(lAr->ki | poss->try(lar ki))
      locally {
        val e2 = mYU(w, e)
        if (e2 >= 0) {
          val w2 = w.substring(0, e2)
          val rl = mLAr(w2, w2.length)
          if (rl >= 0) {
            val w3 = w2.substring(0, rl)
            val c = chainKi(w3)
            return if (c != null) c else w3
          }
          val rp = mPoss(w2, w2.length)
          if (rp >= 0) return tryLarKi(w2.substring(0, rp))
          return w2
        }
      }
      // 13: possessives ; delete ; try(lar ki)
      locally {
        val rp = mPoss(w, e)
        if (rp >= 0) return tryLarKi(w.substring(0, rp))
      }
      w
    }

    private def mNU(w: String, e: Int) = mark(w, e, nUTails)

    def stem(input: String): String = {
      val word = lowerSimple(input)
      if (word.count(isV) <= 1) return word
      val (v, cont) = verbPass(word)
      if (!cont) return v
      var w = nounPass(v)
      if (w != "ad" && w != "soyad") {
        if (w.nonEmpty && (w.last == 'd' || w.last == 'g')) {
          var i = w.length - 1
          while (i >= 0 && !isV(w.charAt(i))) i -= 1
          if (i >= 0) {
            val app = w.charAt(i) match {
              case 'a' | 'ı' => "ı"
              case 'e' | 'i' => "i"
              case 'o' | 'u' => "u"
              case _ => "ü"
            }
            w += app
          }
        }
        if (w.nonEmpty) w.last match {
          case 'b' => w = w.dropRight(1) + "p"
          case 'c' => w = w.dropRight(1) + "ç"
          case 'd' => w = w.dropRight(1) + "t"
          case 'ğ' => w = w.dropRight(1) + "k"
          case _ =>
        }
      }
      if (w.isEmpty) word else w
    }
  }


  // ===================================================================
  // Armenian / Lithuanian / Catalan / Basque — the last four of the
  // reference's 20 word_stem languages (WordStemFunction.java:55-77).
  // Ported EXACTLY from the snowball algorithms as compiled into
  // PostgreSQL 15's open-source dict_snowball library: the among
  // tables, region marks, and per-case actions were read out of the
  // binary with scripts/stemfit/so_extract.py and the control flow
  // transcribed from the stem functions' disassembly; each port was
  // then verified to ZERO diffs against live ts_lexize on 160k-word
  // multi-seed fuzz corpora plus the 12-13k word convergence corpora
  // (reference Python models: scripts/stemfit/{hy,lt,ca,eu}_exact.py).
  // All four lowercase via [[lowerSimple]], matching the PG oracle's
  // lowerstr (same convention as fi/hu/tr).
  // ===================================================================

  /** Armenian: pV = after the first vowel, p2 = Russian-style R2; the
    * whole backward pass runs under `setlimit tomark pV`, then four
    * test-once amongs in order — case endings (R2-gated), verb,
    * adjective, noun — each a plain longest-match delete. */
  object Armenian {
    private val vowels = "աեէըիուօ"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val hyEnding: Seq[String] = Seq(
      "ությանդ", "ությանը", "ությանն", "ությանս", "ներում", "ության",
      "ներից", "վանից", "երում", "անում", "ներին", "ներով",
      "երից", "ոջից", "ներդ", "վանդ", "ները", "վանը",
      "ների", "ներն", "երին", "վանս", "երով", "անով",
      "ներ", "ուց", "ցից", "վից", "ամբ", "երդ",
      "ուդ", "անդ", "ոջդ", "երը", "անը", "ոջը",
      "երի", "երն", "ուն", "վան", "ոջս", "վով",
      "եր", "ից", "ոց", "սա", "վա", "վի",
      "ան", "ին", "ոջ", "ով", "ց", "դ",
      "ը", "ի", "ն")

    private val hyVerb: Seq[String] = Seq(
      "ացրինք", "վեցինք", "ացրիր", "վեցիր", "ալուց", "ելուց",
      "ացրեց", "ացրիք", "վեցիք", "ացանք", "ացինք", "եցինք",
      "ացնալ", "եցնել", "ացվել", "եցվել", "կոտել", "ացրին",
      "վեցին", "ացար", "եցար", "ացիր", "եցիր", "ալու",
      "ելու", "ացաք", "ացիք", "եցիք", "ցանք", "ացրի",
      "վեցի", "անալ", "ենալ", "ցնել", "ատել", "ոտել",
      "վում", "ացան", "ացին", "եցին", "ալիս", "ելիս",
      "ացավ", "եցավ", "ալով", "ելով", "ցաք", "անք",
      "ացա", "եցա", "ացի", "եցի", "ըալ", "ըել",
      "նել", "չել", "վել", "տել", "ված", "ում",
      "ցան", "ար", "աց", "եց", "աք", "վե",
      "ալ", "ել", "ան", "ավ", "ա")

    private val hyAdj: Seq[String] = Seq(
      "երորդ", "րորդ", "որակ", "վուն", "արան", "ական",
      "երեն", "եկեն", "որէն", "ովին", "լայն", "ավետ",
      "բար", "ալի", "ակի", "գին", "պես", "կոտ",
      "եղ", "են", "ին", "իվ", "ատ")

    private val hyNoun: Seq[String] = Seq(
      "ություն", "մունք", "ավոր", "անօց", "ալիք", "անիք",
      "վածք", "ույք", "ունք", "ույթ", "ուհի", "անակ",
      "յուն", "արան", "ստան", "եղէն", "ուստ", "գար",
      "վոր", "արք", "չեք", "ենք", "ոնք", "իչք",
      "որդ", "ուկ", "յակ", "պան", "ածո", "ուս",
      "ոց", "ու", "իք", "ցի", "իլ", "ակ",
      "իկ", "ան", "իչ", "ք")

    def stem(input: String): String = {
      var w = lowerSimple(input)
      val n = w.length
      var c = 0
      while (c < n && !isV(w.charAt(c))) c += 1
      val pV = if (c < n) c + 1 else n
      var p2 = n
      if (c < n) {
        c += 1
        while (c < n && isV(w.charAt(c))) c += 1
        if (c < n) {
          c += 1
          while (c < n && !isV(w.charAt(c))) c += 1
          if (c < n) {
            c += 1
            while (c < n && isV(w.charAt(c))) c += 1
            if (c < n) p2 = c + 1
          }
        }
      }
      // longest match not crossing pV, delete if start >= floor;
      // test-once (a failing floor does NOT fall through)
      def strip(table: Seq[String], floor: Int): Unit =
        table.find(s => w.length - s.length >= pV && w.endsWith(s))
          .foreach { s =>
            if (w.length - s.length >= floor)
              w = w.substring(0, w.length - s.length)
          }
      strip(hyEnding, p2)
      strip(hyVerb, 0)
      strip(hyAdj, 0)
      strip(hyNoun, 0)
      w
    }
  }

  /** Lithuanian: optional hop-1 for 'a'-initial words over 6 letters,
    * R1 mark, then: conflict remaps (e.g. aite→aitė), one R1-limited
    * pass over the big inflectional among, a č→t / dž→d respelling,
    * a REPEATED R1-limited pass over the derivational among, the
    * respelling again, and a final gd→g. The R1 limit constrains the
    * MATCH (snowball limit_backward), so a long suffix reaching past
    * R1 is passed over for a shorter one that fits. */
  object Lithuanian {
    private val vowels = "aeiouyąėęįūų"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val ltStep1: Seq[String] = Seq(
      "tumeisi", "tumėmės", "tumėtės", "iuosna", "tumėme", "tumėte",
      "siuosi", "čiausi", "telėti", "terėti", "tumeis", "enimis",
      "iosna", "uosna", "enyje", "eryje", "iuose", "enyse",
      "eryse", "eriai", "tumei", "erimi", "siesi", "ėjosi",
      "iuosi", "iuoti", "iauti", "inėti", "eniui", "tumėm",
      "iomis", "enims", "erims", "iamės", "kimės", "simės",
      "iatės", "sitės", "tumėt", "eria", "osna", "ysna",
      "ėsna", "enie", "erie", "ioje", "iuje", "iame",
      "sime", "iose", "uose", "iate", "kite", "site",
      "tute", "iumi", "iasi", "iesi", "aisi", "eisi",
      "uisi", "uosi", "ausi", "tųsi", "enti", "inti",
      "ioti", "uoti", "auti", "enio", "iais", "imis",
      "omis", "umis", "ėmis", "enis", "asis", "ysis",
      "iams", "iems", "ioms", "iuos", "iaus", "enys",
      "erys", "amės", "imės", "omės", "ėmės", "atės",
      "otės", "ėtės", "čiau", "eniu", "oje", "uje",
      "yje", "ėje", "ame", "ome", "ėme", "ose",
      "yse", "ėse", "ate", "ite", "ote", "ėte",
      "iai", "imi", "umi", "asi", "esi", "isi",
      "osi", "usi", "ąsi", "ėsi", "ųsi", "oti",
      "yti", "ėti", "iui", "iam", "iem", "sim",
      "tum", "ion", "iun", "ėjo", "ias", "ies",
      "ais", "ams", "ims", "oms", "ums", "ėms",
      "ens", "ios", "uos", "ers", "aus", "ius",
      "iąs", "tųs", "iat", "sit", "iau", "siu",
      "enį", "erį", "erų", "ia", "ie", "ai",
      "ei", "ki", "si", "ti", "ui", "oj",
      "ėj", "am", "im", "om", "ėm", "an",
      "on", "un", "ėn", "io", "uo", "as",
      "es", "is", "os", "us", "ys", "ąs",
      "ės", "ūs", "įs", "at", "it", "ot",
      "ėt", "au", "iu", "ią", "ių", "a",
      "e", "i", "k", "o", "s", "u",
      "y", "ą", "ė", "ę", "į", "ų")

    private val ltStep2: Seq[String] = Seq(
      "utėait", "uliuk", "učiuk", "siant", "iuoj", "zgan",
      "iais", "iuos", "iaus", "iant", "iuot", "ykšt",
      "ykšč", "ing", "iaj", "iej", "ioj", "uoj",
      "auj", "iąj", "iųj", "iok", "iuk", "išk",
      "iul", "dam", "jam", "ain", "esn", "iop",
      "ias", "ies", "ais", "ios", "uos", "aus",
      "iąs", "ant", "int", "uot", "iau", "dav",
      "ėję", "aj", "oj", "ąj", "ėj", "ųj",
      "ok", "yl", "ėl", "am", "op", "os",
      "ąs", "ęs", "ot", "yt", "ėt", "sv",
      "šv", "ę")

    private val ltConflicts: Seq[(String, String)] = Seq(
      ("okatės", "okatė"), ("aitės", "aitė"), ("uotės", "uotė"),
      ("ojime", "ojimas"), ("ėjime", "ėjimas"), ("avime", "avimas"),
      ("okate", "okatė"), ("aite", "aitė"), ("uote", "uotė"),
      ("asius", "asys"), ("esiu", "esys"))

    private def utf8Len(s: String): Int =
      s.foldLeft(0)((a, c) => a + (if (c < 0x80) 1 else if (c < 0x800) 2 else 3))

    private def fixChdz(w: String): String =
      if (utf8Len(w) < 2) w
      else if (w.endsWith("dž")) w.dropRight(2) + "d"
      else if (w.endsWith("č")) w.dropRight(1) + "t"
      else w

    def stem(input: String): String = {
      var w = lowerSimple(input)
      val n = w.length
      var c = if (n > 6 && w.charAt(0) == 'a') 1 else 0
      var p1 = n
      while (c < n && !isV(w.charAt(c))) c += 1
      if (c < n) {
        c += 1
        while (c < n && isV(w.charAt(c))) c += 1
        if (c < n) p1 = c + 1
      }
      if (utf8Len(w) > 3)
        ltConflicts.find(p => w.endsWith(p._1)).foreach { case (s, r) =>
          w = w.substring(0, w.length - s.length) + r
        }
      if (w.length >= p1)
        ltStep1.find(s => w.length - s.length >= p1 && w.endsWith(s))
          .foreach(s => w = w.substring(0, w.length - s.length))
      w = fixChdz(w)
      var go = w.length >= p1
      while (go) {
        ltStep2.find(s => w.length - s.length >= p1 && w.endsWith(s)) match {
          case Some(s) =>
            w = w.substring(0, w.length - s.length)
            go = w.length >= p1
          case None => go = false
        }
      }
      w = fixChdz(w)
      if (w.endsWith("gd")) w = w.dropRight(1)
      w
    }
  }

  /** Catalan: R1/R2 marks, then attached_pronoun (R1 delete),
    * (standard_suffix OR verb_suffix) — verb runs only when standard
    * finds no entry or its region test fails — residual_suffix, and a
    * forward de-accenting pass. Standard cases: 1 R1-del, 2 R2-del,
    * 3 R2→"log", 4 R2→"ic", 5 R1→"c"; verb: 1 R1-del, 2 R2-del
    * ('ando'); residual: 1 R1-del, 2 R1→"ic" ('iqu'). */
  object Catalan {
    private val vowels = "aeiouàáèéíïòóúü"
    private def isV(c: Char) = vowels.indexOf(c) >= 0

    private val caPronoun: Seq[String] = Seq(
      "selas", "selos", "sela", "selo", "-les", "-nos",
      "-la", "-me", "-te", "'hi", "-li", "'ho",
      "las", "les", "'ls", "-ls", "'ns", "-ns",
      "ens", "los", "nos", "vos", "-us", "la",
      "le", "me", "se", "hi", "li", "'l",
      "'m", "-m", "'n", "-n", "ho", "lo",
      "'s", "us", "'t")

    private val caStandard: Seq[(String, Int)] = Seq(
      ("quíssimes", 5), ("allengües", 1), ("ativitats", 1), ("quíssima", 5), ("ialismes", 1),
      ("ialistes", 1), ("ionistes", 1), ("lógiques", 3), ("quíssims", 5), ("bilitats", 1),
      ("ativitat", 1), ("ialista", 1), ("ionista", 1), ("ialisme", 1), ("ionisme", 1),
      ("quíssim", 5), ("atòries", 1), ("íssimes", 1), ("ivitats", 1), ("bilitat", 1),
      ("isament", 1), ("lógica", 3), ("atòria", 1), ("íssima", 1), ("ivisme", 1),
      ("ificar", 1), ("lógics", 3), ("ancies", 1), ("encies", 1), ("ències", 1),
      ("logies", 3), ("formes", 1), ("idores", 1), ("atives", 1), ("logíes", 3),
      ("íssims", 1), ("acions", 2), ("aments", 1), ("ivitat", 1), ("ancia", 1),
      ("encia", 1), ("ència", 1), ("logia", 3), ("íinia", 1), ("ívola", 1),
      ("sfera", 1), ("adora", 1), ("adura", 1), ("ativa", 1), ("logía", 3),
      ("ístic", 1), ("issem", 1), ("ìssem", 1), ("íssem", 1), ("íssim", 1),
      ("ìssin", 1), ("itzar", 1), ("doras", 1), ("ícies", 1), ("inies", 1),
      ("ínies", 1), ("eries", 1), ("àries", 1), ("ables", 1), ("ibles", 1),
      ("ismes", 1), ("dores", 1), ("dures", 1), ("asses", 1), ("ictes", 1),
      ("istes", 1), ("iques", 4), ("logis", 3), ("toris", 1), ("cions", 1),
      ("assos", 1), ("issos", 1), ("adors", 1), ("idors", 1), ("itats", 1),
      ("ïtats", 1), ("ments", 1), ("trius", 1), ("atius", 1), ("ament", 1),
      ("isseu", 1), ("ìsseu", 1), ("ísseu", 1), ("íssiu", 1), ("enca", 1),
      ("ícia", 1), ("inia", 1), ("eria", 1), ("ària", 1), ("alla", 1),
      ("ella", 1), ("dora", 1), ("assa", 1), ("essa", 1), ("issa", 1),
      ("ista", 1), ("atge", 1), ("able", 1), ("ible", 1), ("isme", 1),
      ("aire", 1), ("icte", 1), ("iste", 1), ("logi", 3), ("tori", 1),
      ("ívol", 1), ("isam", 1), ("amen", 1), ("egar", 1), ("ejar", 1),
      ("itar", 1), ("nces", 1), ("ades", 2), ("bles", 1), ("imes", 1),
      ("ines", 1), ("eres", 1), ("ores", 1), ("eses", 1), ("oses", 1),
      ("ites", 1), ("otes", 1), ("ives", 1), ("icis", 1), ("ícis", 1),
      ("aris", 1), ("ells", 1), ("ions", 1), ("esos", 1), ("osos", 1),
      ("dors", 1), ("ants", 1), ("ents", 1), ("itat", 1), ("ïtat", 1),
      ("ient", 1), ("ment", 1), ("triu", 1), ("atiu", 1), ("ació", 1),
      ("ica", 4), ("ada", 2), ("ima", 1), ("ana", 1), ("ina", 1),
      ("era", 1), ("ora", 1), ("esa", 1), ("osa", 1), ("eta", 1),
      ("ita", 1), ("ota", 1), ("iva", 1), ("nça", 1), ("enc", 1),
      ("esc", 1), ("ble", 1), ("ici", 1), ("íci", 1), ("ari", 1),
      ("all", 1), ("ell", 1), ("fer", 1), ("dor", 1), ("dur", 1),
      ("ics", 4), ("uds", 1), ("als", 1), ("ims", 1), ("ers", 1),
      ("ors", 1), ("ats", 1), ("ets", 1), ("ots", 1), ("uts", 1),
      ("ius", 1), ("dís", 1), ("ant", 1), ("ent", 1), ("ció", 1),
      ("ic", 4), ("ud", 1), ("al", 1), ("il", 1), ("ar", 1),
      ("or", 1), ("ls", 1), ("ès", 1), ("és", 1), ("ís", 1),
      ("ós", 1), ("et", 1), ("ot", 1), ("ió", 1), ("ó", 1))

    private val caVerb: Seq[(String, Int)] = Seq(
      ("iéramos", 1), ("aríamos", 1), ("eríamos", 1), ("iríamos", 1), ("iésemos", 1),
      ("eresseu", 1), ("esquen", 1), ("isquen", 1), ("ïsquen", 1), ("esquin", 1),
      ("adores", 1), ("esques", 1), ("ïsques", 1), ("ierais", 1), ("aríais", 1),
      ("eríais", 1), ("iríais", 1), ("ieseis", 1), ("asteis", 1), ("isteis", 1),
      ("esquis", 1), ("ábamos", 1), ("áramos", 1), ("aremos", 1), ("eremos", 1),
      ("iremos", 1), ("ásemos", 1), ("adora", 1), ("esqui", 1), ("àssem", 1),
      ("éssem", 1), ("iguem", 1), ("ïguem", 1), ("irìem", 1), ("aríem", 1),
      ("iríem", 1), ("assim", 1), ("essim", 1), ("issim", 1), ("àssim", 1),
      ("èssim", 1), ("éssim", 1), ("íssim", 1), ("arian", 1), ("ieran", 1),
      ("arían", 1), ("erían", 1), ("irían", 1), ("arien", 1), ("irien", 1),
      ("iesen", 1), ("assen", 1), ("essen", 1), ("issen", 1), ("éssen", 1),
      ("ïssen", 1), ("eixen", 1), ("assin", 1), ("essin", 1), ("issin", 1),
      ("ïssin", 1), ("eixin", 1), ("ieron", 1), ("iendo", 1), ("eixer", 1),
      ("ieras", 1), ("arías", 1), ("erías", 1), ("irías", 1), ("atges", 1),
      ("aries", 1), ("iries", 1), ("ieses", 1), ("asses", 1), ("esses", 1),
      ("isses", 1), ("ïsses", 1), ("eixes", 1), ("abais", 1), ("arais", 1),
      ("aseis", 1), ("assis", 1), ("essis", 1), ("issis", 1), ("ïssis", 1),
      ("eixis", 1), ("itzis", 1), ("aréis", 1), ("eréis", 1), ("iréis", 1),
      ("íamos", 1), ("adors", 1), ("erass", 1), ("asseu", 1), ("esseu", 1),
      ("àsseu", 1), ("ésseu", 1), ("igueu", 1), ("ïgueu", 1), ("itzeu", 1),
      ("irìeu", 1), ("aríeu", 1), ("iríeu", 1), ("assiu", 1), ("issiu", 1),
      ("àssiu", 1), ("èssiu", 1), ("éssiu", 1), ("íssiu", 1), ("esca", 1),
      ("isca", 1), ("ïsca", 1), ("aria", 1), ("iria", 1), ("iera", 1),
      ("itza", 1), ("aría", 1), ("ería", 1), ("iría", 1), ("iese", 1),
      ("aste", 1), ("iste", 1), ("eixi", 1), ("itzi", 1), ("arem", 1),
      ("irem", 1), ("àrem", 1), ("írem", 1), ("avem", 1), ("àvem", 1),
      ("ávem", 1), ("aban", 1), ("aran", 1), ("iran", 1), ("aren", 1),
      ("eren", 1), ("iren", 1), ("àren", 1), ("ïren", 1), ("asen", 1),
      ("aven", 1), ("ixen", 1), ("ïxen", 1), ("inin", 1), ("isin", 1),
      ("aron", 1), ("arán", 1), ("erán", 1), ("irán", 1), ("ando", 2),
      ("eixo", 1), ("itzo", 1), ("tzar", 1), ("ador", 1), ("abas", 1),
      ("adas", 1), ("idas", 1), ("aras", 1), ("ades", 1), ("ides", 1),
      ("udes", 1), ("ïdes", 1), ("ares", 1), ("ires", 1), ("ïres", 1),
      ("ases", 1), ("ques", 1), ("aves", 1), ("ixes", 1), ("ïxes", 1),
      ("íais", 1), ("inis", 1), ("isis", 1), ("ados", 1), ("idos", 1),
      ("amos", 1), ("imos", 1), ("ents", 1), ("aràs", 1), ("iràs", 1),
      ("arás", 1), ("erás", 1), ("irás", 1), ("arés", 1), ("erau", 1),
      ("ineu", 1), ("areu", 1), ("ireu", 1), ("àreu", 1), ("íreu", 1),
      ("àveu", 1), ("áveu", 1), ("itzà", 1), ("aba", 1), ("ada", 1),
      ("ida", 1), ("uda", 1), ("ïda", 1), ("ara", 1), ("ira", 1),
      ("ïra", 1), ("ava", 1), ("ixa", 1), ("isc", 1), ("ïsc", 1),
      ("dre", 1), ("ase", 1), ("ini", 1), ("íem", 1), ("ían", 1),
      ("ien", 1), ("ïen", 1), ("sin", 1), ("iïn", 1), ("ado", 1),
      ("ido", 1), ("ixo", 1), ("ïxo", 1), ("ías", 1), ("ids", 1),
      ("ies", 1), ("ïes", 1), ("sis", 1), ("áis", 1), ("ams", 1),
      ("ass", 1), ("ess", 1), ("ats", 1), ("its", 1), ("iïs", 1),
      ("ant", 1), ("ent", 1), ("int", 1), ("ieu", 1), ("ìeu", 1),
      ("íeu", 1), ("eix", 1), ("itz", 1), ("arà", 1), ("irà", 1),
      ("ará", 1), ("erá", 1), ("irá", 1), ("irè", 1), ("aré", 1),
      ("eré", 1), ("iré", 1), ("ia", 1), ("ía", 1), ("ïa", 1),
      ("ad", 1), ("ed", 1), ("id", 1), ("ie", 1), ("re", 1),
      ("ii", 1), ("am", 1), ("em", 1), ("ïm", 1), ("an", 1),
      ("en", 1), ("in", 1), ("io", 1), ("ar", 1), ("er", 1),
      ("ir", 1), ("as", 1), ("es", 1), ("às", 1), ("és", 1),
      ("ís", 1), ("at", 1), ("it", 1), ("ut", 1), ("ït", 1),
      ("au", 1), ("ïu", 1), ("ix", 1), ("ïx", 1), ("ià", 1),
      ("iï", 1), ("ió", 1), ("í", 1))

    private val caResidual: Seq[(String, Int)] = Seq(
      ("iqu", 2), ("itz", 1), ("ïn", 1), ("ir", 1), ("is", 1),
      ("os", 1), ("ïs", 1), ("it", 1), ("eu", 1), ("iu", 1),
      ("a", 1), ("e", 1), ("i", 1), ("o", 1), ("s", 1),
      ("à", 1), ("á", 1), ("é", 1), ("ì", 1), ("í", 1),
      ("ï", 1), ("ó", 1))

    private val caClean = Map(
      'à' -> 'a', 'á' -> 'a', 'è' -> 'e', 'é' -> 'e', 'ì' -> 'i',
      'í' -> 'i', 'ï' -> 'i', 'ò' -> 'o', 'ó' -> 'o', 'ú' -> 'u',
      'ü' -> 'u', '·' -> '.')

    def stem(input: String): String = {
      var w = lowerSimple(input)
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      caPronoun.find(w.endsWith) match {
        case Some(s) if w.length - s.length >= r1 =>
          w = w.substring(0, w.length - s.length)
        case _ =>
      }
      var ok = false
      caStandard.find(p => w.endsWith(p._1)).foreach { case (s, res) =>
        val st = w.length - s.length
        res match {
          case 1 if st >= r1 => w = w.substring(0, st); ok = true
          case 2 if st >= r2 => w = w.substring(0, st); ok = true
          case 3 if st >= r2 => w = w.substring(0, st) + "log"; ok = true
          case 4 if st >= r2 => w = w.substring(0, st) + "ic"; ok = true
          case 5 if st >= r1 => w = w.substring(0, st) + "c"; ok = true
          case _ =>
        }
      }
      if (!ok)
        caVerb.find(p => w.endsWith(p._1)).foreach { case (s, res) =>
          val st = w.length - s.length
          if (res == 1 && st >= r1) w = w.substring(0, st)
          else if (res == 2 && st >= r2) w = w.substring(0, st)
        }
      caResidual.find(p => w.endsWith(p._1)).foreach { case (s, res) =>
        val st = w.length - s.length
        if (res == 1 && st >= r1) w = w.substring(0, st)
        else if (res == 2 && st >= r1) w = w.substring(0, st) + "ic"
      }
      w.map(ch => caClean.getOrElse(ch, ch))
    }
  }

  /** Basque: Romance RV + R1/R2, then a backward pass with a
    * NON-resetting cursor: `repeat aditzak`, `repeat izenak`,
    * `do adjetiboak`. A failing region test ends the repeat; a
    * slice_from keeps the cursor at the match start, so replacement
    * text (e.g. "baditu") is protected from further stripping —
    * modeled by the explicit (word, cursor) pair. Case actions:
    * aditzak 1 RV-del, 2 R2-del, 3→"atseden", 4→"arabera",
    * 5→"baditu"; izenak 1 RV-del, 2 R2-del, 3→"jok", 4 R1-del,
    * 5→"tra", 6→"minutu", 7→"zehar", 8→"geldi", 9→"igaro",
    * 10→"aurka"; adjetiboak 1 RV-del, 2→"z". */
  object Basque {
    private def isV(c: Char) = "aeiou".indexOf(c) >= 0

    private val euAditzak: Seq[(String, Int)] = Seq(
      ("tzailea", 1), ("arabera", 4), ("atseden", 3), ("kundea", 1), ("tailea", 1),
      ("taldia", 1), ("garria", 2), ("karria", 1), ("tezina", 1), ("kizuna", 1),
      ("gailua", 1), ("erreza", 1), ("gaitza", 1), ("kaitza", 1), ("kuntza", 1),
      ("tzaile", 1), ("tarazi", 1), ("aldatu", 1), ("baditu", 5), ("bidea", 1),
      ("kidea", 1), ("pidea", 1), ("galea", 1), ("gunea", 1), ("kunea", 1),
      ("tzaga", 1), ("aldia", 1), ("karia", 1), ("tzaka", 1), ("ezina", 1),
      ("korra", 1), ("kunde", 1), ("tzake", 1), ("tzeke", 1), ("taile", 1),
      ("taldi", 1), ("etari", 1), ("garri", 2), ("karri", 1), ("arazi", 1),
      ("rekin", 1), ("tezin", 1), ("kizun", 1), ("gailu", 1), ("errez", 1),
      ("gaitz", 1), ("kaitz", 1), ("idea", 1), ("gaia", 1), ("mena", 1),
      ("pena", 1), ("kina", 1), ("kuna", 1), ("tuna", 1), ("bera", 1),
      ("kera", 1), ("pera", 1), ("orra", 1), ("dura", 1), ("gura", 1),
      ("kura", 1), ("tura", 1), ("keta", 1), ("bide", 1), ("kide", 1),
      ("pide", 1), ("gale", 1), ("gune", 1), ("kune", 1), ("atze", 1),
      ("aldi", 1), ("kari", 1), ("lari", 1), ("tari", 1), ("rean", 1),
      ("etan", 1), ("ezin", 1), ("dako", 1), ("tzat", 1), ("tatu", 1),
      ("tzez", 1), ("era", 1), ("eta", 1), ("eza", 1), ("tza", 2),
      ("ide", 1), ("tze", 1), ("gai", 1), ("ari", 1), ("ean", 1),
      ("kan", 1), ("men", 1), ("pen", 1), ("kin", 1), ("tun", 1),
      ("ago", 1), ("tio", 1), ("kor", 1), ("atu", 1), ("ka", 1),
      ("la", 1), ("le", 1), ("ki", 1), ("an", 1), ("go", 1),
      ("or", 1), ("du", 1), ("tu", 1), ("ez", 1))

    private val euIzenak: Seq[(String, Int)] = Seq(
      ("minutuko", 6), ("garrena", 1), ("gerrena", 1), ("kaldea", 1), ("taldea", 1),
      ("tzalea", 1), ("zionea", 1), ("aurrea", 1), ("taldia", 1), ("handia", 1),
      ("mendia", 1), ("garria", 2), ("larria", 1), ("kirria", 1), ("ontzia", 1),
      ("gibela", 1), ("urrena", 1), ("tzaina", 1), ("tasuna", 1), ("kondoa", 1),
      ("tzarra", 1), ("mendua", 1), ("mentua", 1), ("koitza", 1), ("gintza", 1),
      ("kintza", 1), ("kuntza", 1), ("garren", 1), ("gerren", 1), ("tariko", 1),
      ("gintzo", 1), ("gintzu", 1), ("denda", 1), ("gabea", 1), ("kabea", 1),
      ("aldea", 1), ("ordea", 1), ("zalea", 1), ("gilea", 1), ("kumea", 1),
      ("gunea", 1), ("kotea", 1), ("artea", 1), ("ostea", 1), ("etxea", 1),
      ("aldia", 1), ("degia", 1), ("tegia", 1), ("nahia", 1), ("tokia", 1),
      ("karia", 1), ("laria", 1), ("taria", 1), ("keria", 1), ("teria", 1),
      ("duria", 1), ("bizia", 1), ("aurka", 10), ("kaila", 1), ("skila", 1),
      ("zaina", 1), ("garna", 1), ("asuna", 1), ("ondoa", 1), ("takoa", 1),
      ("zinoa", 1), ("taroa", 1), ("zaroa", 1), ("liara", 1), ("tiara", 1),
      ("etara", 1), ("tzara", 1), ("korra", 1), ("ordua", 1), ("lekua", 1),
      ("burua", 1), ("durua", 1), ("estua", 1), ("eroza", 1), ("antza", 1),
      ("kalde", 1), ("talde", 1), ("tzale", 1), ("zione", 1), ("aurre", 1),
      ("taldi", 1), ("geldi", 8), ("handi", 1), ("mendi", 1), ("garri", 2),
      ("larri", 1), ("kirri", 1), ("ontzi", 1), ("tarik", 1), ("gibel", 1),
      ("urren", 1), ("tzain", 1), ("tasun", 1), ("aizun", 1), ("kondo", 1),
      ("trako", 5), ("etako", 1), ("igaro", 9), ("behar", 1), ("zehar", 7),
      ("mendu", 1), ("mentu", 1), ("koitz", 1), ("kada", 1), ("anda", 1),
      ("emea", 1), ("enea", 1), ("unea", 1), ("anga", 1), ("gaia", 1),
      ("geia", 1), ("egia", 1), ("ohia", 1), ("koia", 1), ("aria", 1),
      ("eria", 1), ("asia", 1), ("ezia", 1), ("joka", 3), ("gela", 1),
      ("tila", 1), ("kana", 1), ("kina", 1), ("mina", 1), ("duna", 1),
      ("ngoa", 1), ("zioa", 1), ("zkoa", 1), ("aroa", 1), ("eroa", 1),
      ("oroa", 1), ("osoa", 1), ("ttoa", 1), ("ztoa", 1), ("txoa", 1),
      ("tzoa", 1), ("dara", 1), ("tara", 1), ("bera", 1), ("kera", 1),
      ("pera", 1), ("keta", 1), ("tsua", 1), ("txua", 1), ("tzua", 1),
      ("gabe", 1), ("kabe", 1), ("kide", 1), ("alde", 1), ("orde", 1),
      ("zale", 1), ("gile", 1), ("kume", 1), ("gune", 1), ("kote", 1),
      ("arte", 1), ("oste", 1), ("etxe", 1), ("aldi", 1), ("degi", 1),
      ("tegi", 1), ("nahi", 1), ("toki", 1), ("kari", 1), ("lari", 1),
      ("tari", 1), ("duri", 1), ("kail", 1), ("etan", 1), ("tzen", 4),
      ("zain", 1), ("asun", 1), ("ondo", 1), ("tako", 1), ("tuko", 1),
      ("zino", 1), ("taro", 1), ("zaro", 1), ("giro", 1), ("liar", 1),
      ("tiar", 1), ("tzar", 1), ("ordu", 1), ("leku", 1), ("buru", 2),
      ("duru", 1), ("tatu", 4), ("estu", 1), ("eroz", 1), ("ada", 1),
      ("nea", 1), ("pea", 1), ("tea", 1), ("kia", 1), ("oia", 1),
      ("tia", 1), ("ska", 1), ("xka", 1), ("zka", 1), ("ola", 1),
      ("ena", 1), ("una", 1), ("koa", 1), ("noa", 1), ("toa", 1),
      ("ñoa", 1), ("ara", 1), ("ora", 2), ("tra", 1), ("osa", 1),
      ("eta", 1), ("sta", 1), ("dua", 1), ("tua", 1), ("zua", 1),
      ("eza", 1), ("tza", 2), ("eme", 1), ("une", 1), ("gai", 1),
      ("gei", 1), ("egi", 1), ("ohi", 1), ("goi", 1), ("koi", 1),
      ("ari", 1), ("asi", 1), ("ail", 1), ("kan", 1), ("tan", 1),
      ("ren", 2), ("ten", 4), ("kin", 1), ("min", 1), ("dun", 1),
      ("ngo", 1), ("zio", 1), ("eko", 1), ("sko", 1), ("zko", 1),
      ("aro", 1), ("ero", 1), ("oro", 1), ("oso", 1), ("tto", 1),
      ("zto", 1), ("txo", 1), ("tzo", 1), ("dar", 1), ("tar", 1),
      ("kor", 1), ("ket", 1), ("tsu", 1), ("txu", 1), ("tzu", 1),
      ("ga", 1), ("ka", 1), ("na", 1), ("ra", 1), ("sa", 1),
      ("ta", 1), ("za", 1), ("ge", 1), ("ne", 1), ("pe", 1),
      ("te", 1), ("di", 1), ("ki", 1), ("oi", 1), ("ti", 1),
      ("ñi", 1), ("ak", 1), ("ek", 1), ("en", 4), ("go", 1),
      ("ko", 1), ("no", 1), ("ro", 1), ("to", 1), ("ño", 1),
      ("zp", 1), ("ar", 1), ("or", 2), ("os", 1), ("du", 1),
      ("tu", 1), ("zu", 1), ("ez", 1), ("tz", 1), ("z", 1))

    private val euAdjetiboak: Seq[(String, Int)] = Seq(
      ("keria", 1), ("lanik", 1), ("larik", 1), ("zlea", 2), ("dade", 1),
      ("tade", 1), ("date", 1), ("tate", 1), ("ztik", 1), ("era", 1),
      ("rik", 1), ("ero", 1), ("la", 1), ("gi", 1), ("ki", 1),
      ("ik", 1), ("go", 1), ("ro", 1), ("to", 1))

    // result -> (region: 0=RV 1=R1 2=R2, -1 none; replacement: null=del)
    private val aditzakAct: Map[Int, (Int, String)] = Map(
      1 -> (0, null), 2 -> (2, null), 3 -> (-1, "atseden"),
      4 -> (-1, "arabera"), 5 -> (-1, "baditu"))
    private val izenakAct: Map[Int, (Int, String)] = Map(
      1 -> (0, null), 2 -> (2, null), 3 -> (-1, "jok"), 4 -> (1, null),
      5 -> (-1, "tra"), 6 -> (-1, "minutu"), 7 -> (-1, "zehar"),
      8 -> (-1, "geldi"), 9 -> (-1, "igaro"), 10 -> (-1, "aurka"))
    private val adjAct: Map[Int, (Int, String)] = Map(
      1 -> (0, null), 2 -> (-1, "z"))

    def stem(input: String): String = {
      var w = lowerSimple(input)
      val pV = rvRomance(w, isV)
      val p1 = regionAfter(w, 0, isV)
      val p2 = regionAfter(w, p1, isV)
      val regs = Array(pV, p1, p2)
      var e = w.length
      def run(table: Seq[(String, Int)], act: Map[Int, (Int, String)],
          repeat: Boolean): Unit = {
        var go = true
        while (go) {
          table.find { case (s, _) =>
            e - s.length >= 0 && w.startsWith(s, e - s.length)
          } match {
            case Some((s, res)) =>
              val st = e - s.length
              val (reg, repl) = act(res)
              if (reg >= 0 && st < regs(reg)) go = false
              else {
                w = w.substring(0, st) + (if (repl == null) "" else repl) +
                  w.substring(e)
                e = st
                if (!repeat) go = false
              }
            case None => go = false
          }
        }
      }
      run(euAditzak, aditzakAct, repeat = true)
      run(euIzenak, izenakAct, repeat = true)
      run(euAdjetiboak, adjAct, repeat = false)
      w
    }
  }

  /** Codes [[stem]] dispatches — used by the word_stem builder to
    * fail FAST (at analysis) on an unknown LITERAL code, matching the
    * reference's eager stemmer resolution. */
  val Languages: Set[String] =
    Set("en", "de", "fr", "es", "it", "pt", "da", "no", "sv", "nl", "ru",
      "ro", "ir", "fi", "hu", "tr", "hy", "lt", "ca", "eu")

  /** Dispatch by 2-letter code — the reference's FULL 20-language set
    * (WordStemFunction.java:48-77); any other code raises like the
    * reference's INVALID_FUNCTION_ARGUMENT.
    *
    * Case-handling convention: the PG oracle lowercases EVERY input at
    * the dictionary layer (dict_snowball's lowerstr), so uppercase
    * behavior is unobservable through ts_lexize and the convergence
    * corpora are all-lowercase. For the languages ported from the
    * published algorithm text (en..ro) we pass case through, matching
    * the reference (Lucene never lowercases; the algorithms just don't
    * match uppercase suffixes). The black-box-recovered stemmers
    * (fi/hu/tr, and hy/lt/ca/eu below) bake the oracle's lowerstr in
    * via [[lowerSimple]] because their recovered tables are only
    * defined on lowercase input. Known, accepted asymmetry:
    * word_stem('EV','tr') stems while word_stem('HOUSES','en') does
    * not — each side matches the engine its tables came from. */
  def stem(word: String, lang: String): String = lang match {
    case "en" => Porter2.stem(word)
    case "de" => German.stem(word)
    case "fr" => French.stem(word)
    case "es" => Spanish.stem(word)
    case "it" => Italian.stem(word)
    case "pt" => Portuguese.stem(word)
    case "da" => Danish.stem(word)
    case "no" => Norwegian.stem(word)
    case "sv" => Swedish.stem(word)
    case "nl" => Dutch.stem(word)
    case "ru" => Russian.stem(word)
    case "ro" => Romanian.stem(word)
    case "ir" => Irish.stem(word)
    case "fi" => Finnish.stem(word)
    case "hu" => Hungarian.stem(word)
    case "tr" => Turkish.stem(word)
    case "hy" => Armenian.stem(word)
    case "lt" => Lithuanian.stem(word)
    case "ca" => Catalan.stem(word)
    case "eu" => Basque.stem(word)
    case other =>
      throw new IllegalArgumentException(s"Unknown stemmer language: $other")
  }
}
