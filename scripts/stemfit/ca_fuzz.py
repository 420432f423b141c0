#!/usr/bin/env python3
"""Fuzz harness for the Catalan prototype."""
import random, sys, importlib
import pg_stem
import ca_proto

STEMS = ["cant", "port", "treball", "nacional", "felic", "univers",
         "gran", "pet", "europ", "produ", "lluit", "program", "sistem",
         "import", "gener", "antig", "escrip", "coneix", "aleg", "anir",
         "qual", "organ", "form", "inform", "catal", "barcelon", "val",
         "estudi", "public", "histор", "histori", "polit", "cultur",
         "person", "grup", "temp", "cas", "vid", "man", "pas", "lloc",
         "mon", "pais", "ciut", "amab", "amabl", "possib", "terrib",
         "vol", "fer", "dir", "don", "pens", "cre", "sab", "mir",
         "amic", "llibre", "taula", "casa", "home", "dona", "nen",
         "paraul", "ciutat", "govern", "empres", "servei", "project"]

SUFFIXES = ["", "a", "es", "s", "os", "or", "ors", "ora", "ores",
            "ar", "er", "ir", "at", "ada", "ats", "ades", "it", "ida",
            "ament", "ement", "ment", "ments", "itat", "itats", "able",
            "ables", "ible", "ibles", "isme", "ismes", "ista", "istes",
            "ic", "ica", "ics", "iques", "osa", "oses", "osos", "ós",
            "ació", "acions", "ador", "adora", "adors", "adores",
            "ància", "ència", "ances", "enca", "esa", "essa", "icia",
            "atge", "ió", "ions", "ció", "cions", "logia", "logies",
            "íssim", "íssima", "et", "eta", "ets", "etes", "ut", "uda",
            "atiu", "ativa", "iu", "iva", "ius", "ives", "ari", "aria",
            "eria", "al", "als", "il", "ística", "ívol", "ívola",
            "ava", "aves", "aven", "ia", "ies", "ien", "í", "ares",
            "aren", "arà", "arem", "aran", "aria", "arien", "és",
            "éssim", "essin", "eix", "eixen", "isc", "isquen", "ant",
            "ent", "int", "em", "eu", "en", "is", "im",
            "'ls", "'l", "'m", "'n", "'ns", "'s", "'t", "'hi", "'ho",
            "-ho", "-hi", "-la", "-les", "-li", "-lo", "-los", "-me",
            "-nos", "-se", "-te", "-vos", "-us", "-ne"]

ALPHA = "abcdefghijlmnopqrstuvxyzçàèéíïòóúü"
CONS = "bcdfghjklmnpqrstvxz"
VOW = "aeiouàèéíòóú"

def rand_word(rng):
    n = rng.randint(1, 4)
    w = ""
    for _ in range(n):
        if rng.random() < 0.8:
            w += rng.choice(CONS)
        if rng.random() < 0.2:
            w += rng.choice(CONS)
        w += rng.choice(VOW)
        if rng.random() < 0.4:
            w += rng.choice(CONS)
    return w

def gen_probes(seed, n_random=4000):
    rng = random.Random(seed)
    probes = set()
    for s in STEMS:
        for suf in SUFFIXES:
            probes.add(s + suf)
        for _ in range(15):
            probes.add(s + rng.choice(SUFFIXES) + rng.choice(SUFFIXES))
    for _ in range(n_random):
        w = rand_word(rng)
        probes.add(w)
        probes.add(w + rng.choice(SUFFIXES))
    return sorted(p for p in probes if p)

def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    probes = gen_probes(seed)
    print(f"{len(probes)} probes", file=sys.stderr)
    oracle = pg_stem.pg_stem('ca', probes)
    importlib.reload(ca_proto)
    diffs = []
    for w in probes:
        exp = oracle.get(w)
        if exp is None:
            continue
        got = ca_proto.stem(w)
        if got != exp:
            diffs.append((w, got, exp))
    print(f"diffs: {len(diffs)} / {len(probes)}", file=sys.stderr)
    for w, got, exp in diffs[:int(sys.argv[2]) if len(sys.argv) > 2 else 60]:
        print(f"{w}\tgot={got}\twant={exp}")
    return len(diffs)

if __name__ == '__main__':
    sys.exit(0 if main() == 0 else 1)
