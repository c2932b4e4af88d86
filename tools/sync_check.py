#!/usr/bin/env python3
"""Key-sync audit: SURVEY.md §2's inventory, SparkEntry.queries, and
SparkEntry.oracleSql must tell one story.

Checks:
  1. every SURVEY §2 query key (q/ev/dd/ss/tx/mm/pp/gr/sk row) has a
     SparkEntry.queries entry, and vice versa;
  2. a SURVEY row marked `| sql |` has an oracleSql entry; a row marked
     `| rows |` / `rows+spec` must NOT (it would silently upgrade the
     declared contract);
  3. no oracleSql entry without a queries entry.
Exit 1 on any drift.
"""
import re
import sys
import pathlib

root = pathlib.Path(__file__).resolve().parent.parent
survey = (root / "SURVEY.md").read_text()
entry = (root / "src/main/scala/graft/SparkEntry.scala").read_text()

qsec = entry.split("def queries")[1].split("def oracleSql")[0]
qkeys = set(re.findall(r'"((?:q|ev|dd|ss|tx|mm|pp|gr|sk)\d{2}[a-z0-9_]*)"\s*->', qsec))
osec = entry.split("def oracleSql")[1]
okeys = set(re.findall(r'"((?:q|ev|dd|ss|tx|mm|pp|gr|sk)\d{2}[a-z0-9_]*)"\s*->', osec))

skeys, smode = {}, {}
for m in re.finditer(
        r"^\| ((?:q|ev|dd|ss|tx|mm|pp|gr|sk)\d{2}[a-z0-9_]*) \|(.*)$",
        survey, re.M):
    key, rest = m.group(1), m.group(2)
    cells = [c.strip() for c in rest.strip().strip("|").split("|")]
    mode = cells[-1] if cells else ""
    skeys[key] = True
    smode[key] = "sql" if mode.startswith("sql") else "rows"

fail = []
if set(skeys) - qkeys:
    fail.append(f"SURVEY rows missing from queries: {sorted(set(skeys) - qkeys)}")
if qkeys - set(skeys):
    fail.append(f"queries missing a SURVEY row: {sorted(qkeys - set(skeys))}")
if okeys - qkeys:
    fail.append(f"oracleSql without queries entry: {sorted(okeys - qkeys)}")
for k, mode in sorted(smode.items()):
    if mode == "sql" and k in qkeys and k not in okeys:
        fail.append(f"{k}: SURVEY says sql but no oracleSql entry")
    if mode == "rows" and k in okeys:
        fail.append(f"{k}: SURVEY declares rows-only but an oracle exists")

print(f"queries={len(qkeys)} oracles={len(okeys)} survey_rows={len(skeys)} "
      f"rows_only={sorted(qkeys - okeys)}")
if fail:
    print("\n".join("DRIFT: " + f for f in fail))
    sys.exit(1)
print("key-sync OK")
