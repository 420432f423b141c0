#!/usr/bin/env python3
"""Case-collapse-normalized registry parity diff (VERDICT r5 missing #1).

Extracts every public function name the reference registers — from
@ScalarFunction/@AggregationFunction/@WindowFunction annotation values,
bare annotations (method-name-derived), alias lists, and explicit
Signature("name", ...) declarations in the SqlScalarFunction builders —
across presto-main, presto-geospatial, presto-ml, presto-teradata-functions.
Lowercases everything (Presto's parser resolves case-insensitively), then
diffs against the lowercased name dump from graft.tools.DumpFunctions.

Usage: python3 scripts/registry_diff.py [/tmp/graft_fn_names.txt]
"""
import re, sys, os, json

def camel_to_snake(name):
    """Presto's bare-annotation name derivation: Guava
    LOWER_CAMEL.to(LOWER_UNDERSCORE, methodName) — see
    presto-main/.../scalar/annotations/ScalarImplementationHeader.java:67,81
    (bare @ScalarFunction hammingDistance registers hamming_distance).
    """
    return re.sub(r'([A-Z])', r'_\1', name).lower()

REF = "/root/reference"
MODULES = [
    "presto-main/src/main/java",
    "presto-geospatial/src/main/java",
    "presto-geospatial-toolkit/src/main/java",
    "presto-ml/src/main/java",
    "presto-teradata-functions/src/main/java",
]

# Names Presto registers but hides / that are operators, not callable by name
SKIP_PREFIXES = ("$",)

ann_val = re.compile(
    r'@(ScalarFunction|AggregationFunction|WindowFunction)\s*\(\s*'
    r'(?:value\s*=\s*)?"([^"]+)"')
ann_alias = re.compile(
    r'@(?:ScalarFunction|AggregationFunction)\s*\(([^)]*alias[^)]*)\)',
    re.S)
alias_names = re.compile(r'"([^"]+)"')
# bare annotation (no string value) -> function name = following method name
ann_bare = re.compile(
    r'@(ScalarFunction|AggregationFunction)\s*(?:\(\s*\))?\s*\n'
    r'(?:\s*@\w+(?:\([^)]*\))?\s*\n)*'          # other annotations between
    r'\s*public\s+(?:static\s+)?(?:final\s+)?[\w.<>\[\],?\s@]+?\s+(\w+)\s*\(')
# explicit Signature("name", ...) in SqlScalarFunction/SqlAggregationFunction
sig_name = re.compile(r'Signature\s*\(\s*"([a-zA-Z_][\w.]*)"')
# SqlScalarFunction.builder-style: .name("x") occasionally
dot_name = re.compile(r'\.name\s*\(\s*"([a-zA-Z_]\w*)"\s*\)')

names = {}

def add(n, src):
    n = n.strip().lower()
    if not n or n.startswith(SKIP_PREFIXES):
        return
    if not re.fullmatch(r'[a-z_][\w$.]*', n):
        return
    names.setdefault(n, src)

for mod in MODULES:
    root = os.path.join(REF, mod)
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.endswith(".java"):
                continue
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, REF)
            s = open(p, encoding="utf-8", errors="replace").read()
            for m in ann_val.finditer(s):
                add(m.group(2), rel)
            for m in ann_bare.finditer(s):
                add(camel_to_snake(m.group(2)), rel)
            for m in ann_alias.finditer(s):
                seg = m.group(1)
                # alias = {"a", "b"} or alias = "a"
                am = re.search(r'alias\s*=\s*(\{[^}]*\}|"[^"]*")', seg)
                if am:
                    for n in alias_names.findall(am.group(1)):
                        add(n, rel)
            if "presto-main" in rel or "geospatial" in rel or "-ml" in rel:
                for m in sig_name.finditer(s):
                    # single-letter captures are Signature type variables
                    # (f/s/t/u/v), not function names — regex over-capture
                    if len(m.group(1)) > 1:
                        add(m.group(1), rel)
                for m in dot_name.finditer(s):
                    add(m.group(1), rel)

# Internal/hidden names the registry never exposes to users (operators,
# casts, internal markers) — Signature() extraction over-captures these.
HIDDEN = set("""
like_pattern like not castvarchartore2jregexp castchartore2jregexp
fail in try row_constructor concat_ws at_timezone_internal
""".split())
hidden_pat = re.compile(
    r'^(operator|\$.*|.*\$internal.*|presto\..*)$')

ref_names = {n: s for n, s in names.items()
             if n not in HIDDEN and not hidden_pat.match(n)}

ours_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_fn_names.txt"
ours = set()
if os.path.exists(ours_path):
    ours = {l.strip().lower() for l in open(ours_path) if l.strip()}

# Names extracted from the reference source that are NOT user-callable
# registry entries, plus capabilities declared out in SURVEY.md — the
# parity gate (RegistryParitySpec) asserts the missing set is a subset
# of exactly this list.
DECLARED_OUT = {
    "unknown",            # the UNKNOWN type's literal marker, not a function
    "array_constructor",  # internal ARRAY[...] operator
    "geometry",           # captured from an optimizer-rule Signature, a type
    "model",              # presto-ml ModelType — a type name, not a function
    "invoke",             # declared out (SURVEY.md §2.11, r2)
    "try_cast",           # TRY_CAST is grammar syntax in both engines
}

missing = sorted(n for n in ref_names if n not in ours)
unexpected = [n for n in missing if n not in DECLARED_OUT]
print(f"reference public names extracted: {len(ref_names)}")
print(f"our resolvable names: {len(ours)}")
print(f"missing ({len(missing)}), declared-out {len(missing) - len(unexpected)}:")
for n in missing:
    tag = " [declared-out]" if n in DECLARED_OUT else ""
    print(f"  {n:40s} {ref_names[n]}{tag}")
json.dump({"missing": missing,
           "unexpected": unexpected,
           "sources": {n: ref_names[n] for n in missing}},
          open("/tmp/registry_diff.json", "w"), indent=1)
sys.exit(0 if not unexpected else 1)
