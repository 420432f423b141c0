#!/usr/bin/env python3
"""Extract snowball among tables from PostgreSQL's dict_snowball.so.

The .so is the open-source snowball stemmer library compiled into
PostgreSQL (BSD-licensed, same algorithms PG's ts_lexize oracle runs).
Reading its static among tables gives the exact suffix inventories the
black-box fitting in this directory was recovering probe-by-probe.

Usage: so_extract.py <among_vaddr_hex> <count> [--env utf8]
Prints one line per among entry:
  idx  s_size  "suffix"  substring_i  result  function_vaddr
"""
import struct, subprocess, sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"

_blob = open(SO, "rb").read()

# program headers: map vaddr -> file offset
_segs = []
out = subprocess.run(["readelf", "-lW", SO], capture_output=True, text=True).stdout
for line in out.splitlines():
    p = line.split()
    if p and p[0] == "LOAD":
        off, va, _, fsz = int(p[1], 16), int(p[2], 16), p[3], int(p[4], 16)
        _segs.append((va, va + fsz, off))

def v2o(vaddr):
    for lo, hi, off in _segs:
        if lo <= vaddr < hi:
            return vaddr - lo + off
    raise ValueError(f"vaddr {vaddr:#x} unmapped")

# R_X86_64_RELATIVE relocations: slot vaddr -> target vaddr (addend)
_rel = {}
out = subprocess.run(["readelf", "-rW", SO], capture_output=True, text=True).stdout
for line in out.splitlines():
    p = line.split()
    if len(p) >= 4 and p[2] == "R_X86_64_RELATIVE":
        _rel[int(p[0], 16)] = int(p[-1], 16)

def read_ptr(slot_vaddr):
    if slot_vaddr in _rel:
        return _rel[slot_vaddr]
    return struct.unpack_from("<Q", _blob, v2o(slot_vaddr))[0]

def among(vaddr, count):
    """Parse `count` 32-byte among entries at vaddr."""
    rows = []
    for i in range(count):
        base = vaddr + 32 * i
        o = v2o(base)
        s_size = struct.unpack_from("<i", _blob, o)[0]
        s_ptr = read_ptr(base + 8)
        substring_i, result = struct.unpack_from("<ii", _blob, o + 16)
        fn = read_ptr(base + 24)
        if s_size:
            raw = _blob[v2o(s_ptr):v2o(s_ptr) + s_size]
            try:
                s = raw.decode("utf-8")
            except UnicodeDecodeError:
                s = raw.decode("latin-1")
        else:
            s = ""
        rows.append((i, s_size, s, substring_i, result, fn))
    return rows

if __name__ == "__main__":
    va = int(sys.argv[1], 16)
    n = int(sys.argv[2])
    for i, sz, s, sub, res, fn in among(va, n):
        fns = f"{fn:#x}" if fn else "-"
        print(f"{i:3d} {sz:3d} {s!r:24s} link={sub:3d} result={res:3d} fn={fns}")
