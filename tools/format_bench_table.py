"""Render BENCH_QUERIES.json as the two-column markdown table used in
BASELINE.md's "Query timings" section. Prints to stdout; paste over
the old table after a full `python bench.py` refresh.

Usage: python tools/format_bench_table.py [path-to-BENCH_QUERIES.json]
"""
import json
import os
import sys

path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_QUERIES.json")
d = json.load(open(path))
secs = d["queries"]
nrows = d.get("query_rows", {})
rows = sorted(secs.items())
half = (len(rows) + 1) // 2
left, right = rows[:half], rows[half:]

print("| query | sec | rows | query | sec | rows |")
print("|---|---|---|---|---|---|")
for i in range(half):
    ln, ls = left[i]
    cells = [ln, "%.2f" % ls, str(nrows.get(ln, ""))]
    if i < len(right):
        rn, rs = right[i]
        cells += [rn, "%.2f" % rs, str(nrows.get(rn, ""))]
    else:
        cells += ["", "", ""]
    print("| " + " | ".join(cells) + " |")

print("\n%d queries, total %.1f s, headline %.3f s"
      % (len(rows), sum(secs.values()), d.get("headline_sec", -1)),
      file=sys.stderr)
