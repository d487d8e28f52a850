"""Space-group naming (spgs database) and point-group detection (sympg).

The spgs.json table is International Tables data extracted from the
reference (tools/extract_spgs.py); the decoder/closure and the
ops -> symbol identification are validated on textbook structures."""
import numpy as np
import pytest

from critic2_tpu.crystal import spgs
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.crystal.sympg import molecular_point_group, schoenflies


def test_symbol_lookup_and_orders():
    known = {"p 1": 1, "p -1": 2, "p m -3 m": 48, "f m -3 m": 192,
             "p 63/m m c": 24, "r -3 m": 36, "p n m a": 8,
             "i 41/a m d 1": 32, "f d -3 m 1": 192}
    for sym, n in known.items():
        st = spgs.setting(spgs.symbol_to_id(sym))
        R, T = st.full_ops()
        assert len(R) == n, (sym, len(R))


def test_aliases():
    assert spgs.symbol_to_id("c 2/c") == spgs.symbol_to_id("c 1 2/c 1")
    assert spgs.setting(spgs.symbol_to_id("p 21")).ita_number == 4


def test_every_setting_is_a_group():
    rng = np.random.default_rng(1)
    for sid in rng.choice(306, 20, replace=False) + 1:
        st = spgs.setting(int(sid))
        R = st.rotations.astype(int)
        T = (st.translations * 12).round().astype(int)
        cvs = (st.cenvs * 12).round().astype(int)
        keys = {(W.tobytes(), min(tuple((w - c) % 12) for c in cvs))
                for W, w in zip(R, T)}
        for i in range(len(R)):
            for j in range(len(R)):
                W = R[i] @ R[j]
                w = (R[i] @ T[j] + T[i]) % 12
                k = (W.tobytes(), min(tuple((w - c) % 12) for c in cvs))
                assert k in keys, (sid, st.short)


@pytest.mark.parametrize("name,ita", [("NaCl", 225), ("CsCl", 221),
                                      ("Si", 227)])
def test_identify_textbook_structures(name, ita):
    if name == "NaCl":
        x = np.array([[0, 0, 0], [.5, 0, 0], [0, .5, 0], [0, 0, .5],
                      [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
                      [.5, .5, .5]])
        c = Crystal(m_x2c=np.diag([5.64] * 3), x_frac=x,
                    species_of=np.array([0, 1, 1, 1, 0, 0, 0, 1]),
                    species=[Species("Na", 11), Species("Cl", 17)])
    elif name == "CsCl":
        c = Crystal(m_x2c=np.diag([4.11] * 3),
                    x_frac=np.array([[0, 0, 0], [.5, .5, .5]]),
                    species_of=np.array([0, 1]),
                    species=[Species("Cs", 55), Species("Cl", 17)])
    else:
        xs = [(np.array(b) + f) % 1
              for f in [(0, 0, 0), (0, .5, .5), (.5, 0, .5), (.5, .5, 0)]
              for b in [(0, 0, 0), (.25, .25, .25)]]
        c = Crystal(m_x2c=np.diag([5.43] * 3), x_frac=np.array(xs),
                    species_of=np.zeros(8, dtype=int),
                    species=[Species("Si", 14)])
    sym, n = c.spg_name()
    assert n == ita, (name, sym, n)


def test_point_groups():
    cases = [
        ("C2v", [[0, 0, .1173], [0, .7572, -.4692], [0, -.7572, -.4692]],
         [8, 1, 1]),
        ("C3v", [[0, 0, .1], [.94, 0, -.3], [-.47, .814, -.3],
                 [-.47, -.814, -.3]], [7, 1, 1, 1]),
        ("Td", [[0, 0, 0]] + [[x, y, z] for x, y, z in
                              [(1, 1, 1), (1, -1, -1), (-1, 1, -1),
                               (-1, -1, 1)]], [6, 1, 1, 1, 1]),
        ("Oh", [[0, 0, 0]] + [list(v) for v in
                              np.vstack([np.eye(3), -np.eye(3)])],
         [16, 9, 9, 9, 9, 9, 9]),
        ("Dooh", [[0, 0, 0], [0, 0, 1.16], [0, 0, -1.16]], [6, 8, 8]),
        ("Coov", [[0, 0, 0], [0, 0, 1.06], [0, 0, -1.16]], [6, 1, 7]),
    ]
    for want, coords, z in cases:
        sym, _ = molecular_point_group(np.array(coords, float),
                                       np.array(z))
        assert sym == want, (want, sym)


def test_benzene_d6h():
    ang = np.arange(6) * np.pi / 3
    bz = [[np.cos(a), np.sin(a), 0] for a in ang] + \
         [[2 * np.cos(a), 2 * np.sin(a), 0] for a in ang]
    sym, ops = molecular_point_group(np.array(bz), np.array([6] * 6
                                                            + [1] * 6))
    assert sym == "D6h" and len(ops) == 24


def test_wyckoff_letters():
    """Wyckoff letters from the spglib site-symmetry database
    (src/spglib/site_symmetry.c get_Wyckoff_notation): NaCl 4a/4b,
    CsCl 1a/1b, rutile Ti 2a + O 4f."""
    a = 5.64
    x = np.array([[0, 0, 0], [.5, 0, 0], [0, .5, 0], [0, 0, .5],
                  [.5, .5, 0], [.5, 0, .5], [0, .5, .5], [.5, .5, .5]])
    nacl = Crystal(m_x2c=np.diag([a] * 3), x_frac=x,
                   species_of=np.array([0, 1, 1, 1, 0, 0, 0, 1]),
                   species=[Species("Na", 11), Species("Cl", 17)])
    letters = nacl.wyckoffs()
    reps = np.asarray(nacl.spacegroup.irr_idx)
    by_name = {nacl.species[nacl.species_of[r]].name: w
               for r, w in zip(reps, letters)}
    assert by_name == {"Na": "a", "Cl": "b"}

    u = 0.305
    xr = np.array([[0, 0, 0], [.5, .5, .5], [u, u, 0],
                   [(-u) % 1, (-u) % 1, 0], [.5 + u, .5 - u, .5],
                   [.5 - u, .5 + u, .5]])
    rutile = Crystal(m_x2c=np.diag([8.68, 8.68, 5.59]), x_frac=xr,
                     species_of=np.array([0, 0, 1, 1, 1, 1]),
                     species=[Species("Ti", 22), Species("O", 8)])
    assert sorted(rutile.wyckoffs()) == ["a", "f"]
