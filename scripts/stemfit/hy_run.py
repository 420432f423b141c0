#!/usr/bin/env python3
"""Fit + validate the Armenian stemmer tables."""
import sys, json, random
import pg_stem, langfit

VOWELS = "աեէըիուօ"

CAND = sorted(set("""
ի ից ով ում ան ին իվ ու ոջ վա ամբ է ը ն ս դ ա ո
ության ություն ութ յան
ներ եր ները ների ներն ներին ներից ներով ներում
երի երին երից երով երում
ել ալ ուլ եմ ես ենք եք են իմ իր ինք իք ին
եցի եցիր եցինք եցիք եցին ացի ացիր ացինք ացիք ացին
ացա ացար ացանք ացաք ացան եցա եցար եցանք եցաք
վել վում ված ած ող ելու ալու անալ ենալ անամ ենամ
ելով ալով ելիս ալիս եցող ացող ացել եցել
բար պես որեն ապես
ական ային եղեն ավետ ալի ելի ածո արան ոց իկ ուկ
գույն ավոր
ումս ումդ ումը իս ուս անց ք
անի ացու եցու ար ակ
ատ եց աց ույթ ուց ց
վեց ներս ներդ երս երդ ովս ովդ ումն անք ույց ույժ
ց իլ եղ իչ ավ վոր յուն նել քել յակ չեք չես չեմ չի
մբ ալը ելը կոտ ովին
""".split()))

BASES = ["կլոնկոնզ", "կլոնզ", "կզ", "նակ", "տան", "բար", "կոնտրոզակ",
         "զի", "լո"]

STEMS = ["գր", "տն", "երեխ", "քաղաք", "մարդ", "հայ", "տես", "գն",
         "աս", "մայր", "հայր", "ժամանակ", "երգ", "աշխատ", "սիր",
         "մեծ", "փոքր", "գիրք", "տուն", "ծառ", "ջուր", "լեռ", "քար",
         "արև", "լույս", "գյուղ", "դպրոց", "ուսուցիչ", "բժիշկ"]

def gen_probes(seed=1, n_random=2500):
    rng = random.Random(seed)
    cons = "բգդզթժլխծկհձղճմյնշչպջռսվտրցւփքֆ"
    vow = VOWELS
    probes = set()
    for b in BASES + STEMS:
        for s in CAND:
            probes.add(b + s)
        for _ in range(12):
            probes.add(b + rng.choice(CAND) + rng.choice(CAND))
    def rand_word():
        w = ""
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.8: w += rng.choice(cons)
            w += rng.choice(vow)
            if rng.random() < 0.5: w += rng.choice(cons)
        return w
    for _ in range(n_random):
        w = rand_word()
        probes.add(w)
        probes.add(w + rng.choice(CAND))
    return sorted(probes)

def main():
    lang = langfit.Lang('hy', VOWELS, nstages=4, use_pv_floor=True)
    probes = gen_probes()
    oracle = pg_stem.pg_stem('hy', probes)
    print(f"{len(oracle)} oracle words", file=sys.stderr)
    entries = {s: [(3, 'R2', '')] for s in CAND}
    import os
    if os.path.exists('/tmp/hy_model.json'):
        prev = json.load(open('/tmp/hy_model.json'))
        for s in entries:
            if s in prev:
                entries[s] = [tuple(m) for m in prev[s]]
    best = None
    for sd in (1, 7, 13):
        e2 = {s: list(v) for s, v in entries.items()}
        m, f = langfit.fit(lang, e2, oracle, sweeps=6, seed=sd)
        if best is None or f < best[1]:
            best = (m, f)
        entries = {s: list(v) for s, v in best[0].entries.items()}
    model, final = best
    print("final:", final)
    for d in langfit.diffs(model, oracle, 40):
        print(d)
    json.dump(model.entries, open('/tmp/hy_model.json', 'w'),
              ensure_ascii=False, indent=0)

if __name__ == '__main__':
    main()
