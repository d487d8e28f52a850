"""Extract the Keast tetrahedral quadrature tables (rules 1-10) from the
reference's keast.f90 (John Burkardt's library of Keast 1986 rules) into
critic2_tpu/data/keast.npz — data, not code (SURVEY §2.3 plan).

Each rule is stored expanded: nodes (order, 3) barycentric coordinates
(x, y, z; the 4th is 1-x-y-z) and weights (order,), with sum(w) = 1/6
(the volume of the unit reference tetrahedron).

Run: python tools/extract_keast.py
"""
import re

import numpy as np

SRC = "/root/reference/src/keast.f90"

SUBORDERS = {
    1: [1], 2: [4], 3: [1, 4], 4: [4, 6], 5: [1, 4, 6], 6: [6, 4, 4],
    7: [1, 4, 4, 6], 8: [4, 4, 4, 12], 9: [1, 4, 4, 4, 6, 12],
    10: [1, 4, 4, 6, 6, 12, 12],
}


def _wrap(i, lo, hi):
    n = hi - lo + 1
    return lo + (i - lo) % n


def parse_subrules(text):
    """rule -> (xyzz (4, ns), w (ns,)) from the keast_subrule body."""
    body = text[text.index("subroutine keast_subrule"):]
    body = body[:body.index("end subroutine keast_subrule")]
    out = {}
    for m in re.finditer(r"rule == (\d+) \) then(.*?)(?=else if|else\b)",
                         body, re.S):
        rule = int(m.group(1))
        chunk = m.group(2)
        nums = [float(v.replace("D", "E"))
                for v in re.findall(r"(-?\d+\.\d+D[+-]\d+)", chunk)]
        ns = len(SUBORDERS[rule])
        xyzz = np.array(nums[:4 * ns]).reshape(ns, 4).T
        w = np.array(nums[4 * ns:4 * ns + ns])
        out[rule] = (xyzz, w)
    return out


def expand(rule, xyzz, w):
    """Expand suborders to the full rule (keast_rule expansion logic)."""
    nodes, wts = [], []
    for s, sub in enumerate(SUBORDERS[rule]):
        g = xyzz[:, s]
        if sub == 1:
            nodes.append(g[:3])
            wts.append(w[s])
        elif sub == 4:
            for k in range(1, 5):
                nodes.append([g[_wrap(k, 1, 4) - 1], g[_wrap(k + 1, 1, 4) - 1],
                              g[_wrap(k + 2, 1, 4) - 1]])
                wts.append(w[s])
        elif sub == 6:
            for k in range(3):
                v = [g[0]] * 3
                v[k] = g[2]
                nodes.append(v)
                wts.append(w[s])
            for k in range(3):
                v = [g[2]] * 3
                v[k] = g[0]
                nodes.append(v)
                wts.append(w[s])
        elif sub == 12:
            for k in range(3):
                v = [g[0]] * 3
                v[k] = g[2]
                nodes.append(v)
                wts.append(w[s])
            for k in range(3):
                v = [g[0]] * 3
                v[k] = g[3]
                nodes.append(v)
                wts.append(w[s])
            for k in range(1, 4):
                nodes.append([g[_wrap(k + 1, 2, 4) - 1],
                              g[_wrap(k + 2, 2, 4) - 1],
                              g[_wrap(k + 3, 2, 4) - 1]])
                wts.append(w[s])
            for k in range(1, 4):
                nodes.append([g[_wrap(k + 1, 2, 4) - 1],
                              g[_wrap(k + 3, 2, 4) - 1],
                              g[_wrap(k + 2, 2, 4) - 1]])
                wts.append(w[s])
    return np.asarray(nodes), np.asarray(wts)


def main():
    text = open(SRC).read()
    sub = parse_subrules(text)
    data = {}
    for rule in range(1, 11):
        nodes, wts = expand(rule, *sub[rule])
        assert abs(wts.sum() - 1.0 / 6.0) < 1e-12, (rule, wts.sum())
        # volume exactness: integral of 1 over unit tet = 1/6
        data[f"nodes{rule}"] = nodes
        data[f"weights{rule}"] = wts
        # degree-1 exactness: centroid of x = 1/24
        ix = (wts * nodes[:, 0]).sum()
        assert abs(ix - 1.0 / 24.0) < 1e-10, (rule, ix)
    np.savez_compressed("critic2_tpu/data/keast.npz", **data)
    print("wrote critic2_tpu/data/keast.npz:",
          {r: data[f"nodes{r}"].shape[0] for r in range(1, 11)})


if __name__ == "__main__":
    main()
