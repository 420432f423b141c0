#!/usr/bin/env python3
"""Harvest EVERY among-table suffix string from dict_snowball.so by
scanning the relocated data segment for 32-byte among records
(s_size, s_ptr, substring_i, result, fn_ptr). Used to build
sharper-than-random fuzz pools: fuzzing each language with the union
of all snowball suffixes whose characters fit its alphabet probes the
exact decision boundaries of its tables, including entries a random
generator would almost never emit.

Output: /tmp/snowball_suffixes.txt (one suffix per line, deduped).
"""
import struct, sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from so_extract import _blob, v2o, _rel, _segs


def plausible_str(ptr, size):
    try:
        o = v2o(ptr)
    except ValueError:
        return None
    raw = _blob[o:o + size]
    if len(raw) != size:
        return None
    try:
        s = raw.decode("utf-8")
    except UnicodeDecodeError:
        try:
            s = raw.decode("latin-1")
        except Exception:
            return None
    if any(ch < " " for ch in s):
        return None
    return s


def main():
    found = set()
    # among records live in the RW segment (.data.rel.ro); its pointer
    # slots all carry RELATIVE relocations, so walk those
    slots = sorted(_rel)
    for slot in slots:
        base = slot - 8  # candidate among start (s field at +8)
        try:
            o = v2o(base)
        except ValueError:
            continue
        s_size = struct.unpack_from("<i", _blob, o)[0]
        if not (1 <= s_size <= 24):
            continue
        sub_i, result = struct.unpack_from("<ii", _blob, o + 16)
        if not (-1 <= sub_i <= 4096) or not (-100 <= result <= 100):
            continue
        s = plausible_str(_rel[slot], s_size)
        if s:
            found.add(s)
    out = "/tmp/snowball_suffixes.txt"
    with open(out, "w", encoding="utf-8") as f:
        for s in sorted(found):
            f.write(s + "\n")
    print(f"{len(found)} suffix strings -> {out}")


if __name__ == "__main__":
    main()
