#!/usr/bin/env python3
"""Exact Lithuanian snowball stemmer, transcribed from the among tables
and control flow of PG 15's dict_snowball.so (so_extract.py; stem fn at
0x55270, fix_chdz helper at 0x551d0). Verified vs lt_oracle_cache.json
and live PG fuzz."""
import json

V = set("aeiouyąėęįūų")

CONFLICTS = [  # suffix -> replacement (checked only when len(word)>3 bytes)
    ("okatės", "okatė"), ("aitės", "aitė"), ("uotės", "uotė"),
    ("ojime", "ojimas"), ("ėjime", "ėjimas"), ("avime", "avimas"),
    ("okate", "okatė"), ("aite", "aitė"), ("uote", "uotė"),
    ("asius", "asys"), ("esiu", "esys"),
]

STEP1 = """a ia eria osna iosna uosna iuosna ysna ėsna e ie enie erie oje
ioje uje iuje yje enyje eryje ėje ame iame sime ome ėme tumėme ose iose
uose iuose yse enyse eryse ėse ate iate ite kite site ote tute ėte tumėte
i ai iai eriai ei tumei ki imi erimi umi iumi si asi iasi esi iesi siesi
isi aisi eisi tumeisi uisi osi ėjosi uosi iuosi siuosi usi ausi čiausi ąsi
ėsi ųsi tųsi ti enti inti oti ioti uoti iuoti auti iauti yti ėti telėti
inėti terėti ui iui eniui oj ėj k am iam iem im sim om tum ėm tumėm an on
ion un iun ėn o io enio ėjo uo s as ias es ies is ais iais tumeis imis
enimis omis iomis umis ėmis enis asis ysis ams iams iems ims enims erims
oms ioms ums ėms ens os ios uos iuos ers us aus iaus ius ys enys erys ąs
iąs ės amės iamės imės kimės simės omės ėmės tumėmės atės iatės sitės otės
ėtės tumėtės ūs įs tųs at iat it sit ot ėt tumėt u au iau čiau iu eniu siu
y ą ią ė ę į enį erį ų ių erų""".split()

STEP2 = """ing aj iaj iej oj ioj uoj iuoj auj ąj iąj ėj ųj iųj ok iok iuk
uliuk učiuk išk iul yl ėl am dam jam zgan ain esn op iop ias ies ais iais
os ios uos iuos aus iaus ąs iąs ęs utėait ant iant siant int ot uot iuot
yt ėt ykšt iau dav sv šv ykšč ę ėję""".split()

STEP1.sort(key=len, reverse=True)
STEP2.sort(key=len, reverse=True)
CONFLICTS.sort(key=lambda p: len(p[0]), reverse=True)


def mark_p1(w):
    """Forward pass: optional hop-1 when w starts with 'a' and has >6
    chars, then p1 = after first (vowel, non-vowel) boundary."""
    n = len(w)
    c = 1 if (n and w[0] == "a" and n > 6) else 0
    p1 = n
    while c < n and w[c] not in V: c += 1
    if c >= n: return p1
    c += 1
    while c < n and w[c] in V: c += 1
    if c >= n: return p1
    c += 1
    return c


def _strip(w, lb, table):
    """Longest suffix in table whose start is >= lb (find_among_b with
    limit_backward = lb). Returns (stripped, matched?)."""
    for s in table:
        if len(w) - len(s) >= lb and w.endswith(s):
            return w[:len(w) - len(s)], True
    return w, False


def fix_chdz(w):
    if len(w.encode("utf-8")) < 2:
        return w
    if w.endswith("dž"):
        return w[:-2] + "d"
    if w.endswith("č"):
        return w[:-1] + "t"
    return w


def stem(w):
    p1 = mark_p1(w)
    # fix_conflicts (only when the word is > 3 bytes)
    if len(w.encode("utf-8")) > 3:
        for suf, rep in CONFLICTS:
            if w.endswith(suf):
                w = w[:len(w) - len(suf)] + rep
                break
    # step1 (R1-limited, test once)
    if len(w) >= p1:
        w, _ = _strip(w, p1, STEP1)
    w = fix_chdz(w)
    # step2 (R1-limited, repeat until no match)
    while len(w) >= p1:
        w2, hit = _strip(w, p1, STEP2)
        if not hit:
            break
        w = w2
    w = fix_chdz(w)
    # fix_gd
    if len(w) >= 2 and w.endswith("gd"):
        w = w[:-1]  # gd -> g
    return w


if __name__ == "__main__":
    cache = json.load(open("/root/repo/scripts/stemfit/lt_oracle_cache.json"))
    diffs = 0
    shown = 0
    for word, expect in cache.items():
        got = stem(word)
        if got != expect:
            diffs += 1
            if shown < 20:
                print(f"DIFF {word!r}: got {got!r} want {expect!r}")
                shown += 1
    print(f"{diffs}/{len(cache)} diffs")
