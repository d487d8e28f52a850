#!/usr/bin/env python
"""Extract the Lebedev-Laikov quadrature parameter tables from the
reference (src/tools_math@lebedev.f90, the public CCL Lebedev code) to
critic2_tpu/data/lebedev.json.

Each LDnnnn routine is a sequence of gen_oh calls parameterized by
(code, A, B, V); those numbers are published quadrature data (Lebedev &
Laikov, Dokl. Math. 59 (1999) 477) - DATA, not code, same policy as
tools/extract_spgs.py. The gen_oh point generator itself is
reimplemented in critic2_tpu/ops/lebedev.py.
"""
import json
import os
import re

REF = "/root/reference/src/tools_math@lebedev.f90"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "critic2_tpu", "data", "lebedev.json")


def main():
    text = open(REF).read()
    rules = {}
    for m in re.finditer(
            r"SUBROUTINE (LD\d+)\(X,Y,Z,W,N\)(.*?)END SUBROUTINE \1",
            text, re.S):
        name, body = m.group(1), m.group(2)
        npts = int(name[2:])
        a = b = v = None
        calls = []
        for line in body.splitlines():
            ln = line.strip()
            mm = re.match(r"([ABV])\s*=\s*([0-9.DdEe+-]+)", ln)
            if mm:
                val = float(mm.group(2).replace("D", "E")
                            .replace("d", "E"))
                if mm.group(1) == "A":
                    a = val
                elif mm.group(1) == "B":
                    b = val
                else:
                    v = val
                continue
            mm = re.match(r"Call GEN_OH\(\s*(\d)", ln, re.I)
            if mm:
                calls.append((int(mm.group(1)), a or 0.0, b or 0.0, v))
        rules[npts] = calls
    counts = {1: 6, 2: 12, 3: 8, 4: 24, 5: 24, 6: 48}
    for npts, calls in rules.items():
        tot = sum(counts[c] for c, _, _, _ in calls)
        assert tot == npts, (npts, tot)
    with open(OUT, "w") as fh:
        json.dump({str(k): v for k, v in sorted(rules.items())}, fh)
    print(f"wrote {OUT}: {len(rules)} rules "
          f"({min(rules)}..{max(rules)} points)")


if __name__ == "__main__":
    main()
