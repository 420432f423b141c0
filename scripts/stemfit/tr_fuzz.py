#!/usr/bin/env python3
"""Probe generator + diff harness for the Turkish prototype."""
import random, sys, importlib
import pg_stem
import tr_proto

STEMS = ["ev", "oda", "kitap", "kitab", "çocuk", "göz", "gün", "okul",
         "araba", "anne", "baba", "su", "köy", "el", "yol", "iş", "dün",
         "güzel", "hasta", "yok", "var", "gel", "git", "ağaç", "kedi",
         "kapı", "deniz", "kalem", "masa", "türk", "şehir", "ülke",
         "insan", "kadın", "adam", "para", "zaman", "yer", "hayat",
         "dünya", "türkiye'", "gönül", "ayak", "soyad", "ad", "renk", "yad", "kanad", "murad",
         "kuş", "balık", "yüz", "dil", "ses", "taş", "yön", "öğretmen",
         "doktor", "polis", "asker", "bahçe", "pencere", "tablo",
         "bilgisayar", "telefon", "uçak", "tren", "otobüs", "durak"]

SUFFIXES = ["lar", "ler", "ları", "leri", "da", "de", "ta", "te",
            "dan", "den", "tan", "ten", "nda", "nde", "ndan", "nden",
            "na", "ne", "nı", "ni", "nu", "nü", "ya", "ye", "a", "e",
            "ı", "i", "u", "ü", "yı", "yi", "yu", "yü",
            "ın", "in", "un", "ün", "nın", "nin", "nun", "nün",
            "m", "n", "ım", "im", "um", "üm", "mız", "miz", "muz", "müz",
            "ımız", "imiz", "umuz", "ümüz", "nız", "niz", "nuz", "nüz",
            "ınız", "iniz", "unuz", "ünüz", "sı", "si", "su", "sü",
            "la", "le", "yla", "yle", "ki", "daki", "deki", "taki",
            "ndaki", "ca", "ce", "nca", "nce", "ça", "çe",
            "ydı", "ydi", "ydu", "ydü", "dı", "di", "du", "dü",
            "tı", "ti", "tu", "tü", "sa", "se", "ysa", "yse", "ken",
            "yken", "mış", "miş", "muş", "müş", "ymış", "ymiş",
            "dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür",
            "sın", "sin", "sun", "sün", "sınız", "siniz", "sunuz",
            "sünüz", "yım", "yim", "yum", "yüm", "ız", "iz", "uz", "üz",
            "yız", "yiz", "yuz", "yüz", "casına", "cesine", "çasına",
            "çesine", "d", "g", ""]

CONS = "bcçdfgğhjklmnprsştvyz"
VOW = "aeıioöuü"

def rand_word(rng):
    n = rng.randint(1, 4)
    w = ""
    for _ in range(n):
        if rng.random() < 0.3:
            w += rng.choice(CONS)
        w += rng.choice(VOW)
        if rng.random() < 0.6:
            w += rng.choice(CONS)
        if rng.random() < 0.15:
            w += rng.choice(CONS)
    return w

def gen_probes(seed, n_random=4000):
    rng = random.Random(seed)
    probes = set()
    for s in STEMS:
        for suf in SUFFIXES:
            probes.add(s + suf)
        # double-stacked
        for _ in range(30):
            probes.add(s + rng.choice(SUFFIXES) + rng.choice(SUFFIXES))
        for _ in range(10):
            probes.add(s + rng.choice(SUFFIXES) + rng.choice(SUFFIXES)
                       + rng.choice(SUFFIXES))
    for _ in range(n_random):
        w = rand_word(rng)
        probes.add(w)
        probes.add(w + rng.choice(SUFFIXES))
    return sorted(probes)

def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    probes = gen_probes(seed)
    print(f"{len(probes)} probes", file=sys.stderr)
    oracle = pg_stem.pg_stem('tr', probes)
    importlib.reload(tr_proto)
    diffs = []
    for w in probes:
        exp = oracle.get(w)
        if exp is None:
            continue
        got = tr_proto.stem(w)
        if got != exp:
            diffs.append((w, got, exp))
    print(f"diffs: {len(diffs)} / {len(probes)}", file=sys.stderr)
    for w, got, exp in diffs[:int(sys.argv[2]) if len(sys.argv) > 2 else 60]:
        print(f"{w}\tgot={got}\twant={exp}")
    return len(diffs)

if __name__ == '__main__':
    sys.exit(0 if main() == 0 else 1)
