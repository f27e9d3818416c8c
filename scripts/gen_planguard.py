#!/usr/bin/env python3
"""Rebuild PLANGUARD.md from a PlanScan sweep.

Usage:
  sbt -batch "runMain graft.tools.PlanScan /root/testdata/sf0.001" \
      | grep -E '^(ok|UNSAFE|ERR) ' > /tmp/planscan.txt
  python3 scripts/gen_planguard.py /tmp/planscan.txt

Writes PLANGUARD.md in place (NEVER via shell redirection onto
PLANGUARD.md — the old `> PLANGUARD.md` usage truncated the file
before this script could read it, silently destroying the hand-written
header it is supposed to preserve). Keeps everything above the
distribution table from the existing PLANGUARD.md, updating the
registry count, and regenerates both tables from the sweep output.
"""
import re
import sys

scan_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/planscan.txt"
rows = {}
unsafe = []
for line in open(scan_path):
    m = re.match(r"ok (q_\w+) shuffles=(\d+)", line.strip())
    if m:
        rows[m.group(1)] = int(m.group(2))
        continue
    if line.startswith(("UNSAFE", "ERR")):
        unsafe.append(line.strip())

if unsafe:
    sys.stderr.write("PlanScan reported problems:\n" + "\n".join(unsafe) + "\n")
    sys.exit(1)

header = []
for line in open("PLANGUARD.md"):
    if line.startswith("## Shuffle-count distribution"):
        break
    header.append(line)
header = "".join(header)
if not header.strip():
    sys.stderr.write("PLANGUARD.md header is empty/missing - refusing to "
                     "regenerate without the hand-written preamble\n")
    sys.exit(1)
header = re.sub(r"across all \d+ registered queries",
                f"across all {len(rows)} registered queries", header)

out = [header]
out.append("## Shuffle-count distribution\n\n| shuffles | queries |\n| --- | --- |\n")
dist = {}
for n in rows.values():
    dist[n] = dist.get(n, 0) + 1
for n in sorted(dist):
    out.append(f"| {n} | {dist[n]} |\n")
out.append("\n## Per-query shuffle-exchange counts (static plan, sf0.001)\n\n")
out.append("| query | shuffles |\n| --- | --- |\n")
for q in sorted(rows):
    out.append(f"| {q} | {rows[q]} |\n")

# read fully above, then replace atomically: temp file + rename
import os
import tempfile
fd, tmp = tempfile.mkstemp(dir=".", prefix=".planguard-")
with os.fdopen(fd, "w") as f:
    f.write("".join(out))
os.replace(tmp, "PLANGUARD.md")
sys.stderr.write(f"PLANGUARD.md rewritten: {len(rows)} queries\n")
