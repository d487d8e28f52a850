#!/usr/bin/env python
"""Extract the space-group symbol database from the reference spgs
module (src/spgs.f90:79-695, 1120-...) into critic2_tpu/data/spgs.json.

The table contents are International Tables crystallographic data
(Shmueli encoding: Acta Cryst. A40 (1984) 559): 306 settings with a
short Hermann-Mauguin symbol, the encoded generator string, the ITA
space-group number (from the table comments), plus the alias list.
This extracts DATA, not code - same policy as tools/extract_ref_data.py.
"""
import json
import os
import re

REF = "/root/reference/src/spgs.f90"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "critic2_tpu", "data", "spgs.json")


def grab_array(text, name):
    """Entries of a character array initializer: 'xxx',& lines."""
    m = re.search(rf"{name}\s*=\s*\(/character\(len=24\)::(.*?/\)[^\n]*)",
                  text, re.S)
    body = m.group(1)
    entries = []
    comments = []
    for line in body.splitlines():
        em = re.search(r"'([^']*)'", line)
        if not em:
            continue
        entries.append(em.group(1).strip())
        cm = re.search(r"!\s*(\d+)\.", line)
        comments.append(int(cm.group(1)) if cm else None)
    return entries, comments


def main():
    text = open(REF).read()
    longstr, _ = grab_array(text, "spgs_longstr")
    shortstr, numbers = grab_array(text, "spgs_shortstr")
    assert len(longstr) == 306 and len(shortstr) == 306, (
        len(longstr), len(shortstr))
    # fill missing ITA numbers by carrying the last seen (multi-setting
    # entries repeat the same number; a handful of lines lack comments)
    last = 0
    for i, v in enumerate(numbers):
        if v is None:
            numbers[i] = last
        else:
            last = v

    aliases = {}
    cur_id = None
    for line in text.splitlines():
        m = re.search(r"ialias\(n\)\s*=\s*(\d+)", line)
        if m:
            cur_id = int(m.group(1))
            continue
        m = re.search(r'spgalias\(n\)\s*=\s*"([^"]*)"', line)
        if m and cur_id is not None:
            aliases[m.group(1).strip()] = cur_id

    out = {"short": shortstr, "long": longstr, "ita_number": numbers,
           "aliases": aliases}
    with open(OUT, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {OUT}: 306 settings, {len(aliases)} aliases")


if __name__ == "__main__":
    main()
