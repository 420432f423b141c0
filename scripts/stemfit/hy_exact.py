#!/usr/bin/env python3
"""Exact Armenian snowball stemmer, transcribed from the among tables
and control flow of PG 15's dict_snowball.so (so_extract.py; stem fn at
0x4c630). Verified against hy_oracle_cache.json and live PG fuzz."""
import json, sys

V = set("աեէըիուօ")

ENDING = """եր ներ ց ուց ից երից ներից ցից վանից ոջից վից ոց սա վա ամբ դ երդ
ներդ ուդ անդ ությանդ վանդ ոջդ ը երը ները անը ությանը վանը ոջը ի երի ների վի
երում ներում անում ն երն ներն ուն ան ության վան ին երին ներին ությանն ոջ
ությանս վանս ոջս ով երով ներով անով վով""".split()

VERB = """ար ացար եցար ացրիր ացիր եցիր վեցիր ալուց ելուց աց եց ացրեց ալու
ելու աք ցաք ացաք ացրիք ացիք եցիք վեցիք անք ցանք ացանք ացրինք ացինք եցինք
վեցինք ա ացա եցա վե ացրի ացի եցի վեցի ալ ըալ ացնալ անալ ենալ ել ըել նել
ցնել եցնել չել վել ացվել եցվել տել ատել ոտել կոտել ված ում վում ան ցան
ացան ացրին ացին եցին վեցին ալիս ելիս ավ ացավ եցավ ալով ելով""".split()

ADJ = """բար րորդ երորդ ալի ակի որակ եղ վուն արան ական են երեն եկեն որէն
ին գին ովին լայն պես իվ ատ ավետ կոտ""".split()

NOUN = """գար վոր ավոր անօց ոց ու ք արք չեք իք ալիք անիք վածք ույք ունք
մունք ենք ոնք իչք որդ ույթ ցի ուհի իլ ուկ ակ յակ անակ իկ յուն ություն ան
արան պան ստան եղէն ածո իչ ուս ուստ""".split()

for t in (ENDING, VERB, ADJ, NOUN):
    t.sort(key=len, reverse=True)


def mark_regions(w):
    """pV = after first vowel; p2 = after (v+ c) twice. limit if absent."""
    n = len(w)
    pV = p2 = n
    c = 0
    # gopast v
    while c < n and w[c] not in V: c += 1
    if c >= n: return pV, p2
    c += 1
    pV = c
    # gopast non-v
    while c < n and w[c] in V: c += 1
    if c >= n: return pV, p2
    c += 1
    # gopast v
    while c < n and w[c] not in V: c += 1
    if c >= n: return pV, p2
    c += 1
    # gopast non-v
    while c < n and w[c] in V: c += 1
    if c >= n: return pV, p2
    c += 1
    p2 = c
    return pV, p2


def _strip(w, lb, table, floor=None):
    """Longest suffix in table not crossing lb; floor = extra R cond on
    the match START (delete only if start >= floor). Test-once."""
    for s in table:
        if len(w) - len(s) >= lb and w.endswith(s):
            if floor is not None and len(w) - len(s) < floor:
                return w
            return w[:len(w) - len(s)]
    return w


def stem(w):
    pV, p2 = mark_regions(w)
    if len(w) < pV:
        return w
    lb = pV
    w = _strip(w, lb, ENDING, floor=p2)
    w = _strip(w, lb, VERB)
    w = _strip(w, lb, ADJ)
    w = _strip(w, lb, NOUN)
    return w


if __name__ == "__main__":
    cache = json.load(open("/root/repo/scripts/stemfit/hy_oracle_cache.json"))
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
