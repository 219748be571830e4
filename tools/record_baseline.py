#!/usr/bin/env python3
"""Rewrite BASELINE.md's per-query median table from a Bench JSON line.

Usage: python3 tools/record_baseline.py /tmp/bench.json
Replaces the `| query | sec |` table body and the `Total: **…**` line;
everything else in BASELINE.md is left untouched.
"""
import json, re, sys

bench_path = sys.argv[1]
md_path = "BASELINE.md"

line = open(bench_path).read()
j = json.loads(line[line.index('{'):])
qs = dict(sorted(j["queries"].items()))
assert not j.get("errors"), f"bench had errors: {j['errors']}"

md = open(md_path).read()

total_re = re.compile(r"Total: \*\*[\d.]+ s for \d+ queries\*\*")
md = total_re.sub(f"Total: **{j['value']:.1f} s for {len(qs)} queries**", md, count=1)

table = "| query | sec |\n|---|---|\n" + \
    "".join(f"| {k} | {v:.3f} |\n" for k, v in qs.items())
table_re = re.compile(r"\| query \| sec \|\n\|---\|---\|\n(?:\| \S+ \| [\d.]+ \|\n)+")
assert table_re.search(md), "per-query table not found"
md = table_re.sub(table, md, count=1)

open(md_path, "w").write(md)
print(f"recorded total={j['value']:.1f}s n={len(qs)}")
