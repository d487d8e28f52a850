#!/usr/bin/env python
"""Extract the Wyckoff-position database from the vendored spglib
(src/spglib/sitesym_database.c and spacegroup.c) into
critic2_tpu/data/wyckoff.json.

The arrays are International Tables Wyckoff data in spglib's encoding
(hall-number indexed ranges; first-position operators packed base
45^3 x 24^3, see the comment at sitesym_database.c:1150): DATA, not
code - same policy as the other extractors. The decoder lives in
critic2_tpu/crystal/wyckoff.py.
"""
import json
import os
import re

SRC = "/root/reference/src/spglib"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "critic2_tpu", "data", "wyckoff.json")


def grab_int_array(text, name):
    m = re.search(rf"{name}\s*=\s*\{{(.*?)\}};", text, re.S)
    body = re.sub(r"/\*.*?\*/", " ", m.group(1), flags=re.S)
    return [int(v) for v in re.findall(r"-?\d+", body)]


def main():
    ss = open(os.path.join(SRC, "sitesym_database.c")).read()
    sg = open(os.path.join(SRC, "spacegroup.c")).read()
    position_wyckoff = grab_int_array(ss, r"position_wyckoff\[\]")
    coordinates_first = grab_int_array(ss, r"coordinates_first\[\]")
    num_sitesym = grab_int_array(ss, r"num_sitesym\[\]")
    to_hall = grab_int_array(sg, r"spacegroup_to_hall_number\[230\]")
    assert len(position_wyckoff) == 532, len(position_wyckoff)
    assert len(coordinates_first) == len(num_sitesym), (
        len(coordinates_first), len(num_sitesym))
    assert len(to_hall) == 230
    out = {"position_wyckoff": position_wyckoff,
           "coordinates_first": coordinates_first,
           "num_sitesym": num_sitesym,
           "spacegroup_to_hall": to_hall}
    with open(OUT, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {OUT}: {len(coordinates_first)} wyckoff entries, "
          f"{len(position_wyckoff) - 1} hall settings")


if __name__ == "__main__":
    main()
