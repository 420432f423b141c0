#!/usr/bin/env python3
"""Freeze per-language stemmer corpora from the PostgreSQL snowball
oracle into src/test/resources/stemmer/<lang>_corpus.tsv so
SnowballCorpusSpec runs always-on in CI (round 12 VERDICT task #6).

Word generation: random CV-pattern bases over the language's own
letter inventory (recovered from the Scala stemmer's string literals,
so the fuzz hits the actual suffix tables), with 0-2 suffixes drawn
from that same pool appended. Deterministic seed per language.

German note: the shipped 'de' stemmer is the GERMAN2 variant (digraph
folding, matching the reference's German2Stemmer); PG ships standard
german, so words containing ae/oe/ue/qu are excluded from the frozen
corpus — on the remainder the two variants agree exactly.
"""
import random, re, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'stemfit'))
import pg_stem

SRC = os.path.join(os.path.dirname(__file__), '..',
                   'src/main/scala/graft/functions/SnowballStemmers.scala')
PORTER = os.path.join(os.path.dirname(__file__), '..',
                      'src/main/scala/graft/functions/Porter2.scala')
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src/test/resources/stemmer')

VOWELS = {
    'en': 'aeiouy', 'de': 'aeiouyäöü', 'fr': 'aeiouyâàëéêèïîôûù',
    'es': 'aeiouáéíóúü', 'it': 'aeiouàèìòù', 'pt': 'aeiouáéíóúâêôàãõ',
    'da': 'aeiouyæåø', 'no': 'aeiouyæåø', 'sv': 'aeiouyäåö',
    'nl': 'aeiouyè', 'ru': 'аеиоуыэюя', 'ro': 'aeiouăâî',
    'ir': 'aeiouáéíóú', 'fi': 'aeiouyäö', 'hu': 'aeiouáéíóúöüőű',
    'tr': 'aeıioöuü',
    'hy': 'աեէըիուօ', 'lt': 'aeiouyąėęįūų', 'ca': 'aeiouàáèéíïòóúü',
    'eu': 'aeiou',
}

def object_sections(path):
    text = open(path, encoding='utf-8').read()
    secs = {}
    marks = [(m.start(), m.group(1)) for m in
             re.finditer(r'object (\w+)', text)]
    for i, (pos, name) in enumerate(marks):
        end = marks[i + 1][0] if i + 1 < len(marks) else len(text)
        secs[name] = text[pos:end]
    return secs

OBJ = {'en': 'Porter2', 'de': 'German', 'fr': 'French', 'es': 'Spanish',
       'it': 'Italian', 'pt': 'Portuguese', 'da': 'Danish',
       'no': 'Norwegian', 'sv': 'Swedish', 'nl': 'Dutch', 'ru': 'Russian',
       'ro': 'Romanian', 'ir': 'Irish', 'fi': 'Finnish', 'hu': 'Hungarian',
       'tr': 'Turkish', 'hy': 'Armenian', 'lt': 'Lithuanian',
       'ca': 'Catalan', 'eu': 'Basque'}

def suffix_pool(lang, secs_main, secs_porter):
    sec = (secs_porter if lang == 'en' else secs_main).get(OBJ[lang], '')
    lits = re.findall(r'"([^"\\]{1,9})"', sec)
    pool = set()
    for s in lits:
        if s and all(c.isalpha() and c.islower() for c in s):
            pool.add(s)
    # r13: widen with the union of ALL among suffixes harvested from
    # PG's dict_snowball binary (stemfit/so_extract.py), filtered to
    # this language's alphabet — fuzzing with the real decision
    # boundaries caught hu/ir/nl edge cases the per-language literal
    # pool missed (round 13).
    alphabet = set(''.join(pool)) | set(VOWELS[lang])
    hpath = os.path.join(os.path.dirname(__file__), 'stemfit',
                         'snowball_suffixes.txt')
    if os.path.exists(hpath):
        for s in open(hpath, encoding='utf-8'):
            s = s.strip()
            if s and all(c in alphabet for c in s):
                pool.add(s)
    return sorted(pool)

def gen_words(lang, pool, n=2000):
    rng = random.Random(hash(lang) & 0xffff | 0x9e37)
    vow = VOWELS[lang]
    letters = set(''.join(pool)) | set(vow)
    cons = sorted(c for c in letters if c not in vow and c.isalpha())
    vow = sorted(set(vow))
    if not cons:
        cons = list('bcdfgklmnprst')
    words = set()
    def base():
        w = ''
        for _ in range(rng.randint(1, 3)):
            if rng.random() < 0.85:
                w += rng.choice(cons)
            w += rng.choice(vow)
            if rng.random() < 0.4:
                w += rng.choice(cons)
        return w
    while len(words) < n:
        w = base()
        for _ in range(rng.randint(0, 2)):
            w += rng.choice(pool) if pool and rng.random() < 0.9 \
                else rng.choice(vow)
        if lang == 'de' and re.search(r'ae|oe|ue|qu', w):
            continue
        if 1 < len(w) <= 30:
            words.add(w)
    return sorted(words)

def main():
    langs = sys.argv[1:] or sorted(OBJ)
    os.makedirs(OUT, exist_ok=True)
    secs_main = object_sections(SRC)
    secs_porter = object_sections(PORTER)
    for lang in langs:
        pool = suffix_pool(lang, secs_main, secs_porter)
        words = gen_words(lang, pool)
        stems = pg_stem.pg_stem(lang, words)
        path = os.path.join(OUT, f'{lang}_corpus.tsv')
        with open(path, 'w', encoding='utf-8') as f:
            for w in words:
                f.write(f'{w}\t{stems.get(w, w)}\n')
        print(f'{lang}: {len(words)} words, pool={len(pool)} -> {path}')

if __name__ == '__main__':
    main()
