#!/usr/bin/env python3
"""Turkish snowball prototype — converged against PG 15 pure_tr.

Backwards tail matching: every mark_* takes (w, e) and returns new e or
None. Chains truncate at returned positions (all deletes are tail
deletes). Harmony = last vowel's class must appear ANYWHERE left of it
(snowball goto skips non-class chars, including other vowels).
"""

VOWELS = "aeıioöuü"
U = "ıiuü"
HARMONY = {'a': "aıou", 'e': "eiöü", 'ı': "aı", 'i': "ei",
           'o': "ou", 'ö': "öü", 'u': "ou", 'ü': "öü"}


def check_harmony(w, e):
    i = e - 1
    while i >= 0 and w[i] not in VOWELS:
        i -= 1
    if i < 0:
        return False
    allowed = HARMONY[w[i]]
    j = i - 1
    while j >= 0 and w[j] not in allowed:
        j -= 1
    return j >= 0


def opt_cons(c):
    def f(w, e):
        if e >= 1 and w[e-1] == c:
            if e >= 2 and w[e-2] in VOWELS:
                return e - 1
            return None
        if e >= 2 and w[e-2] in VOWELS:
            return e
        return None
    return f


def opt_U(w, e):
    if e >= 1 and w[e-1] in U:
        if e >= 2 and w[e-2] not in VOWELS:
            return e - 1
        return None
    if e >= 2 and w[e-2] not in VOWELS:
        return e
    return None


opt_n = opt_cons('n')
opt_s = opt_cons('s')
opt_y = opt_cons('y')


def mk(tails, harmony=True, opt=None):
    tails = sorted(tails, key=len, reverse=True)
    def m(w, e):
        if harmony and not check_harmony(w, e):
            return None
        for t in tails:
            if e >= len(t) and w[e-len(t):e] == t:
                e2 = e - len(t)
                if opt is not None:
                    return opt(w, e2)
                return e2
        return None
    return m


# --- suffix marks (harmony flags fitted against PG) -------------------
mark_possessives = mk(["mız", "miz", "muz", "müz",
                       "nız", "niz", "nuz", "nüz", "m", "n"],
                      harmony=False, opt=opt_U)
mark_sU = mk(list(U), harmony=True, opt=opt_s)
mark_lArI = mk(["ları", "leri"], harmony=False)
mark_yU = mk(list(U), harmony=True, opt=opt_y)
mark_nU = mk(["nı", "ni", "nu", "nü"], harmony=True)
mark_nUn = mk(["ın", "in", "un", "ün"], harmony=True, opt=opt_n)
mark_yA = mk(["a", "e"], harmony=True, opt=opt_y)
mark_nA = mk(["na", "ne"], harmony=True)
mark_DA = mk(["da", "de", "ta", "te"], harmony=True)
mark_ndA = mk(["nda", "nde"], harmony=True)
mark_DAn = mk(["dan", "den", "tan", "ten"], harmony=True)
mark_ndAn = mk(["ndan", "nden"], harmony=True)
mark_ylA = mk(["la", "le"], harmony=True, opt=opt_y)
mark_ki = mk(["ki"], harmony=False)
mark_ncA = mk(["ca", "ce"], harmony=True, opt=opt_n)
mark_yken = mk(["ken"], harmony=False, opt=opt_y)
mark_cAsInA = mk(["casına", "cesine"], harmony=False)
mark_yDU = mk([d + v + p for d in "dt" for v in "ıiuü" for p in ["", "m", "n", "k"]],
              harmony=True, opt=opt_y)
mark_ysA = mk(["s" + v + p for v in "ae" for p in ["", "m", "n", "k"]],
              harmony=False, opt=opt_y)
mark_ymUs = mk(["mış", "miş", "muş", "müş"], harmony=True, opt=opt_y)
mark_sUn = mk(["sın", "sin", "sun", "sün"], harmony=True)
mark_yUm = mk(["ım", "im", "um", "üm"], harmony=True, opt=opt_y)
mark_yUz = mk(["ız", "iz", "uz", "üz"], harmony=True, opt=opt_y)
mark_sUnUz = mk(["sınız", "siniz", "sunuz", "sünüz"], harmony=False)
mark_lAr = mk(["lar", "ler"], harmony=True)
mark_nUz = mk(["nız", "niz", "nuz", "nüz"], harmony=True)
mark_DUr = mk(["dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"],
              harmony=True)


# --- verb chain ------------------------------------------------------
def stem_nominal_verb_suffixes(w):
    """Returns (new_word, continue_noun_pass)."""
    e = len(w)

    # A: ymUs_ | yDU | ysA | yken
    for m in (mark_ymUs, mark_yDU, mark_ysA, mark_yken):
        e2 = m(w, e)
        if e2 is not None:
            return w[:e2], True

    # B: cAsInA (sUnUz|lAr|yUm|sUn|yUz|eps) ymUs_
    e2 = mark_cAsInA(w, e)
    if e2 is not None:
        e3 = e2
        for m in (mark_sUnUz, mark_lAr, mark_yUm, mark_sUn, mark_yUz):
            r = m(w, e3)
            if r is not None:
                e3 = r
                break
        e4 = mark_ymUs(w, e3)
        if e4 is not None:
            return w[:e4], True

    # C: lAr ; delete ; try (DUr|yDU|ysA|ymUs) ; unset continue
    e2 = mark_lAr(w, e)
    if e2 is not None:
        w2 = w[:e2]
        for m in (mark_DUr, mark_yDU, mark_ysA, mark_ymUs):
            r = m(w2, len(w2))
            if r is not None:
                w2 = w2[:r]
                break
        return w2, False

    # D: nUz (yDU|ysA)
    e2 = mark_nUz(w, e)
    if e2 is not None:
        for m in (mark_yDU, mark_ysA):
            r = m(w, e2)
            if r is not None:
                return w[:r], True

    # E: (sUnUz|yUz|sUn|yUm) ; delete ; try ymUs_
    for m in (mark_sUnUz, mark_yUz, mark_sUn, mark_yUm):
        e2 = m(w, e)
        if e2 is not None:
            w2 = w[:e2]
            r = mark_ymUs(w2, len(w2))
            if r is not None:
                w2 = w2[:r]
            return w2, True

    # F: DUr ; delete ; try ((sUnUz|lAr|yUm|sUn|yUz|eps) ymUs_)
    e2 = mark_DUr(w, e)
    if e2 is not None:
        w2 = w[:e2]
        e3 = len(w2)
        e4 = e3
        for m in (mark_sUnUz, mark_lAr, mark_yUm, mark_sUn, mark_yUz):
            r = m(w2, e3)
            if r is not None:
                e4 = r
                break
        r = mark_ymUs(w2, e4)
        if r is not None:
            w2 = w2[:r]
        return w2, True

    return w, True


# --- ki chain --------------------------------------------------------
def chain_ki(w):
    """w ends with ...ki → strip ki and preceding cases. None if no match."""
    e = mark_ki(w, len(w))
    if e is None:
        return None
    # alt 1: DA
    e2 = mark_DA(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            return c if c is not None else w3
        r = mark_possessives(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            r2 = mark_lAr(w3, len(w3))
            if r2 is not None:
                w4 = w3[:r2]
                c = chain_ki(w4)
                return c if c is not None else w4
            return w3
        return w2
    # alt 2: nUn
    e2 = mark_nUn(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_lArI(w2, len(w2))
        if r is not None:
            return w2[:r]
        r = mark_possessives(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            r2 = mark_lAr(w3, len(w3))
            if r2 is not None:
                w4 = w3[:r2]
                c = chain_ki(w4)
                return c if c is not None else w4
            return w3
        c = chain_ki(w2)
        return c if c is not None else w2
    # alt 3: ndA
    e2 = mark_ndA(w, e)
    if e2 is not None:
        r = mark_lArI(w, e2)
        if r is not None:
            return w[:r]
        r = mark_sU(w, e2)
        if r is not None:
            w3 = w[:r]
            r2 = mark_lAr(w3, len(w3))
            if r2 is not None:
                w4 = w3[:r2]
                c = chain_ki(w4)
                return c if c is not None else w4
            return w3
        return chain_ki(w[:e2])
    return None


# --- noun chain ------------------------------------------------------
def try_lar_ki(w):
    r = mark_lAr(w, len(w))
    if r is not None:
        w2 = w[:r]
        c = chain_ki(w2)
        return c if c is not None else w2
    return w


def try_poss_lar_ki(w):
    r = mark_possessives(w, len(w))
    if r is not None:
        return try_lar_ki(w[:r])
    return w


def stem_noun_suffixes(w):
    e = len(w)

    # 1: lAr ; delete ; try chain_ki
    e2 = mark_lAr(w, e)
    if e2 is not None:
        w2 = w[:e2]
        c = chain_ki(w2)
        return c if c is not None else w2

    # 2: ncA ; delete ; try(lArI-del | (poss|sU)-del try(lar ki) | lar ki)
    e2 = mark_ncA(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_lArI(w2, len(w2))
        if r is not None:
            return w2[:r]
        r = mark_possessives(w2, len(w2))
        if r is None:
            r = mark_sU(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            return c if c is not None else w3
        return w2

    # 3: (ndA|nA) (lArI-del | sU-del try(lar ki) | chain_ki)
    e2 = mark_ndA(w, e)
    if e2 is None:
        e2 = mark_nA(w, e)
    if e2 is not None:
        r = mark_lArI(w, e2)
        if r is not None:
            return w[:r]
        r = mark_sU(w, e2)
        if r is not None:
            return try_lar_ki(w[:r])
        c = chain_ki(w[:e2])
        if c is not None:
            return c + w[e2:]   # ki-chain deletes its own slices; the nA/ndA tail stays

    # 4: (ndAn|nU) (sU-del try(lar ki) | lArI-del)
    e2 = mark_ndAn(w, e)
    if e2 is None:
        e2 = mark_nU(w, e)
    if e2 is not None:
        r = mark_sU(w, e2)
        if r is not None:
            return try_lar_ki(w[:r])
        r = mark_lArI(w, e2)
        if r is not None:
            return w[:r]

    # 5: DAn ; delete ; try( poss-del try(lar ki) | lAr-ki | chain_ki )
    e2 = mark_DAn(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_possessives(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            return c if c is not None else w3
        c = chain_ki(w2)
        if c is not None:
            return c
        return w2

    # 6: nUn ; delete ; try( sU-del try(lar ki) | lArI | lAr->(ki|poss) | poss | chain_ki )
    e2 = mark_nUn(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_sU(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        r = mark_lArI(w2, len(w2))
        if r is not None:
            return w2[:r]
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            if c is not None:
                return c
            r2 = mark_possessives(w3, len(w3))
            if r2 is not None:
                return w3[:r2]
            return w3
        r = mark_possessives(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        c = chain_ki(w2)
        if c is not None:
            return c
        return w2

    # 7: DA ; delete ; try( poss-del try(lar ki) | lAr-del chain_ki )
    e2 = mark_DA(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_possessives(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            return c if c is not None else w3
        return w2

    # 8: ylA ; delete ; try((poss|sU)-del try(lar ki) | lAr->(ki|poss) | ki)
    e2 = mark_ylA(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_possessives(w2, len(w2))
        if r is None:
            r = mark_sU(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            if c is not None:
                return c
            r2 = mark_possessives(w3, len(w3))
            if r2 is not None:
                return w3[:r2]
            return w3
        c = chain_ki(w2)
        if c is not None:
            return c
        return w2

    # 9: yA ; delete ; try(lAr-ki | poss-del try(lar ki))
    e2 = mark_yA(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            return c if c is not None else w3
        r = mark_possessives(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        return w2

    # 10: lArI ; delete
    e2 = mark_lArI(w, e)
    if e2 is not None:
        return w[:e2]

    # 11: chain_ki directly
    c = chain_ki(w)
    if c is not None:
        return c

    # 12: yU ; delete ; try(lAr-ki | poss-del try(lar ki))
    e2 = mark_yU(w, e)
    if e2 is not None:
        w2 = w[:e2]
        r = mark_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            c = chain_ki(w3)
            return c if c is not None else w3
        r = mark_possessives(w2, len(w2))
        if r is not None:
            return try_lar_ki(w2[:r])
        return w2

    # 13: possessives ; delete ; try(lar ki)
    e2 = mark_possessives(w, e)
    if e2 is not None:
        return try_lar_ki(w[:e2])

    return w


# --- postlude --------------------------------------------------------
def post_process_last_consonants(w):
    if not w:
        return w
    rep = {'b': 'p', 'c': 'ç', 'd': 't', 'ğ': 'k'}.get(w[-1])
    return w[:-1] + rep if rep else w


def append_U(w):
    if not w or w[-1] not in "dg":
        return w
    i = len(w) - 1
    while i >= 0 and w[i] not in VOWELS:
        i -= 1
    if i < 0:
        return w
    app = {'a': 'ı', 'ı': 'ı', 'e': 'i', 'i': 'i',
           'o': 'u', 'u': 'u', 'ö': 'ü', 'ü': 'ü'}[w[i]]
    return w + app


def more_than_one_syllable(w):
    return sum(1 for c in w if c in VOWELS) > 1


def is_reserved(w):
    return w in ("ad", "soyad")


def stem(word):
    w = word
    if not more_than_one_syllable(w):
        return word
    w, cont = stem_nominal_verb_suffixes(w)
    if not cont:
        return w          # lAr verb branch ends stemming: no noun pass, no postlude
    w = stem_noun_suffixes(w)
    if not is_reserved(w):
        w = append_U(w)
        w = post_process_last_consonants(w)
    return w if w else word   # stemmed-to-empty: keep the original


if __name__ == '__main__':
    import sys
    for a in sys.argv[1:]:
        print(a, stem(a))
