"""Extract the CIF core dictionary tag table from the reference's
dat/cif/cif_core.dic (DDL1) into critic2_tpu/data/cif_core_tags.json.

The reference validates CIF files against this dictionary through
ciftbx (/root/reference/src/ciftbx/); the rebuild validates against the
extracted {tag: type} table (type is DDL1 _type: "numb" or "char").
Category (b) data extraction, same as the other extract_* tools.

Usage: python tools/extract_cif_dict.py
"""
from __future__ import annotations

import json
import os
import re

DIC = "/root/reference/dat/cif/cif_core.dic"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "critic2_tpu", "data", "cif_core_tags.json")


def main():
    text = open(DIC, errors="replace").read()
    tags: dict[str, str] = {}
    # DDL1: data_<name> blocks; tags declared via _name '<tag>' (one or
    # a loop_ of several); type via _type numb|char
    blocks = re.split(r"(?m)^data_", text)[1:]
    for blk in blocks:
        # single `_name '<tag>'` or `loop_ _name` followed by a run of
        # quoted tags on continuation lines
        m = re.search(r"_name\s+((?:'[^']+'\s*)+)", blk)
        names = ([t.lower() for t in re.findall(r"'(_[^']+)'", m.group(1))]
                 if m else [])
        m = re.search(r"(?m)^\s*_type\s+(\w+)\s*$", blk)
        typ = m.group(1).lower() if m else "char"
        for nm in names:
            tags[nm] = typ
    with open(OUT, "w") as fh:
        json.dump(tags, fh, indent=0, sort_keys=True)
    print(f"{len(tags)} tags -> {OUT}")


if __name__ == "__main__":
    main()
