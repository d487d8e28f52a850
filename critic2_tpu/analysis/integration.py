"""Basin-integration driver: YT/Bader + attractor-atom matching + property
integration.

Role of the reference integration (src/integration@proc.f90): build the
basin field (optionally core-augmented), run the chosen decomposition,
match attractors to the atom list (int_reorder_gridout :821-945; unmatched
maxima become non-nuclear maxima, NNM), then integrate every requested
property as a weighted grid reduction and report the table.

Device: decomposition + weighted reductions. Host: matching, merging,
table assembly.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import jax.numpy as jnp
import numpy as np

from .bader import bader_integrate
from .yt import yt_integrate

__all__ = ["intgrid", "IntegrationResult"]


@dataclass
class BasinRow:
    idx: int
    name: str               # atom symbol or "nnm"
    atom: int               # cell-atom index or -1
    xfrac: np.ndarray
    volume: float
    pop: float              # integrated reference density
    lap: float | None = None
    extra: dict = dfield(default_factory=dict)


@dataclass
class IntegrationResult:
    method: str
    rows: list
    nattr_raw: int
    decomp: object = None        # YTResult/BaderResult (weight access)
    attr_map: list = None        # row index per raw attractor
    grid_shape: tuple = None
    rho: object = None           # basin-field grid (device)

    @property
    def charges(self):
        return np.array([r.pop for r in self.rows])

    @property
    def volumes(self):
        return np.array([r.volume for r in self.rows])

    def table(self) -> str:
        extras = list(self.rows[0].extra) if self.rows else []
        hdr = ("# id  name  atom        volume            pop        "
               "position (frac)")
        for name in extras:
            hdr += f"  {name:>16s}"
        lines = [hdr]
        for r in self.rows:
            ln = (f"{r.idx:4d}  {r.name:>4s}  {r.atom:4d}  "
                  f"{r.volume:14.8f}  {r.pop:14.8f}   {r.xfrac[0]:.6f} "
                  f"{r.xfrac[1]:.6f} {r.xfrac[2]:.6f}")
            for name in extras:
                ln += f"  {r.extra[name]:16.8f}"
            lines.append(ln)
        tot_v = sum(r.volume for r in self.rows)
        tot_q = sum(r.pop for r in self.rows)
        lines.append(f"# sum             {tot_v:14.8f}  {tot_q:14.8f}")
        return "\n".join(lines)


def _match_attractors(crystal, xattr, ratom):
    """Map each attractor to the nearest atom within ratom (bohr), else -1
    (reference int_reorder_gridout, src/integration@proc.f90:821-945)."""
    nat = crystal.ncel
    out = np.full(len(xattr), -1, dtype=int)
    if nat == 0:
        return out
    for i, xa in enumerate(xattr):
        d = xa[None, :] - np.asarray(crystal.x_frac)
        d -= np.rint(d)
        dc = np.linalg.norm(d @ np.asarray(crystal.m_x2c).T, axis=1)
        j = int(np.argmin(dc))
        if dc[j] <= ratom:
            out[i] = j
    return out


def intgrid(system, method: str = "yt", ratom: float = 1.0,
            fields: dict | None = None, block: int = 1 << 16,
            grid_shape=None, bader_method: str = "neargrid",
            mesh=None, nnm: bool = True, noatoms: bool = False,
            discard: str | None = None):
    """Run grid basin integration on the reference field of `system`.

    method: "yt" or "bader" (bader_method selects the reference's
    NEARGRID default or ONGRID, src/bader@proc.f90:81).
    fields: optional {name: (n1,n2,n3) array} of
    extra integrands on the same grid. The reference field must be (or is
    rasterized to) a grid; its core-augmented variant is used as basin
    field when the field has usecore set (reference
    src/integration@proc.f90:176-183).
    mesh: optional jax.sharding.Mesh with a "space" axis — runs the YT
    weight construction slab-parallel across devices
    (parallel.yt_sharded); identical weights, multi-chip scaling.

    Attractor-to-atom assignment follows the reference keyword logic
    (src/integration@proc.f90:166-175): nnm=False assigns every
    attractor to its nearest atom regardless of distance (ratom
    effectively infinite); nnm=True keeps attractors farther than
    `ratom` (bohr) from any atom as non-nuclear maxima; noatoms=True
    treats ALL attractors as NNM. discard: an expression string —
    attractors where it evaluates non-zero are dropped with their
    basin's charge and volume (reference bas%expr,
    src/yt@proc.f90:160-166).
    """
    f = system.ref
    c = system.crystal
    if f.type == "grid":
        rho = f.grid.f
        shape = tuple(int(s) for s in rho.shape)
        # core augmentation for the basin field
        env = f.coreenv
        if env is not None:
            rho = rho + _rasterize_env(c, env, shape)
    else:
        shape = tuple(grid_shape or (64, 64, 64))
        rho = _rasterize_field(f, shape, block=block)

    if method == "yt" and mesh is not None:
        from ..parallel.yt_sharded import yt_integrate_sharded

        res = yt_integrate_sharded(mesh, c, np.asarray(rho), result=True)
    elif method == "yt":
        res = yt_integrate(c, rho, block=block)
    elif method == "bader":
        res = bader_integrate(c, rho, block=max(block, 1 << 16),
                              method=bader_method)
    else:
        raise ValueError(f"unknown integration method {method}")

    # registered INTEGRABLE expressions evaluate on the basin grid nodes
    # (reference intgrid_fields, src/integration@proc.f90:949-1178)
    if getattr(system, "integrables", None):
        fields = dict(fields or {})
        n1, n2, n3 = shape
        i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                              indexing="ij")
        xf = np.stack([i.ravel() / n1, j.ravel() / n2, k.ravel() / n3])
        xc = np.asarray(c.m_x2c) @ xf
        from ..arithmetic import compile_expr

        for item in system.integrables:
            # entries are expression strings, or (expr, label) pairs
            # from INTEGRABLE ... NAME (reference propty NAME option)
            expr, label = item if isinstance(item, tuple) else (item, item)
            fn = compile_expr(expr, system)
            out = np.empty(xc.shape[1])
            for lo in range(0, xc.shape[1], block):
                chunk = jnp.asarray(xc[:, lo:lo + block])
                out[lo:lo + chunk.shape[1]] = np.asarray(fn(chunk))
            fields[label] = out.reshape(shape)

    omega = c.volume
    npts = float(np.prod(shape))
    scale = omega / npts

    # one batched adjoint sweep for every integrand (volume, charge,
    # and the INTEGRABLE expressions) — the YT fixpoint amortizes
    fnames = list(fields) if fields else []
    stack = jnp.stack(
        [jnp.ones(int(npts)), jnp.asarray(rho).reshape(-1)]
        + [jnp.asarray(fields[name]).reshape(-1) for name in fnames])
    qall = res.integrate(stack) * scale
    vol, pop = qall[0], qall[1]
    extras = {name: qall[2 + i] for i, name in enumerate(fnames)}

    if noatoms:
        iat = np.full(res.nattr, -1, dtype=int)
    else:
        iat = _match_attractors(c, res.xattr,
                                ratom if nnm else 1e40)

    dropped = np.zeros(res.nattr, dtype=bool)
    if discard:
        xc_attr = (np.asarray(c.m_x2c) @ np.asarray(res.xattr).T).T
        vals = np.asarray(system.eval_expr(discard, xc_attr)).reshape(-1)
        dropped = np.abs(vals) > 1e-30

    # merge attractors mapped to the same atom (reference keeps one row
    # per attractor-atom; multiple maxima inside one atomic basin merge)
    rows = []
    used = {}
    attr_map = []
    for a in range(res.nattr):
        if dropped[a]:
            attr_map.append(-1)
            continue
        key = ("atom", iat[a]) if iat[a] >= 0 else ("nnm", a)
        if key in used:
            r = rows[used[key]]
            r.volume += float(vol[a])
            r.pop += float(pop[a])
            for name in extras:
                r.extra[name] += float(extras[name][a])
            attr_map.append(used[key])
            continue
        if iat[a] >= 0:
            nm = c.species[c.species_of[iat[a]]].name
            xf = np.asarray(c.x_frac[iat[a]])
        else:
            nm = "nnm"
            xf = res.xattr[a]
        rows.append(BasinRow(
            idx=len(rows) + 1, name=nm, atom=int(iat[a]), xfrac=xf,
            volume=float(vol[a]), pop=float(pop[a]),
            extra={k: float(v[a]) for k, v in extras.items()}))
        used[key] = len(rows) - 1
        attr_map.append(used[key])

    return IntegrationResult(method=method, rows=rows, nattr_raw=res.nattr,
                             decomp=res, attr_map=attr_map,
                             grid_shape=shape, rho=rho)


def multipoles(system, intres: IntegrationResult, lmax: int = 4):
    """Atomic multipoles Q_lm = int_basin w rho r^l S_lm(r - x_attr)
    (reference intgrid_multipoles, src/integration@proc.f90:1102-1178).

    Returns (nrows, (lmax+1)^2) with components in -m..m order per l,
    centered on each row's attractor (minimum-image displacements).
    """
    from ..ops.rlm import nlm, solid_harmonics

    c = system.crystal
    res = intres.decomp
    shape = intres.grid_shape
    n1, n2, n3 = shape
    i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                          indexing="ij")
    xf = np.stack([i.ravel() / n1, j.ravel() / n2, k.ravel() / n3], axis=1)
    rho_flat = jnp.asarray(intres.rho).reshape(-1)
    scale = c.volume / float(np.prod(shape))

    out = np.zeros((len(intres.rows), nlm(lmax)))
    for a in range(res.nattr):
        row = intres.attr_map[a]
        if row < 0:              # DISCARDed attractor
            continue
        center = intres.rows[row].xfrac
        d = xf - center[None, :]
        d -= np.rint(d)
        dc = (d @ np.asarray(c.m_x2c).T).T                # (3, N)
        rl = solid_harmonics(jnp.asarray(dc), lmax)       # (nlm, N)
        qa = res.integrate(rl * rho_flat[None, :])        # (nlm, nattr)
        out[row] += np.asarray(qa[:, a]) * scale
    return out


def _rasterize_field(f, shape, block: int = 1 << 16, nder: int = 0):
    """Evaluate a field on the regular grid nodes (fractional (i/n)).

    All chunks are dispatched asynchronously at a uniform padded shape
    (one compile, no per-chunk host sync): a 256^3 rasterize is 256
    device programs whose latency pipelines instead of accumulating
    one round-trip each (17 min -> seconds through the remote tunnel)."""
    c = f.crystal
    n1, n2, n3 = shape
    i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                          indexing="ij")
    xf = np.stack([i.ravel() / n1, j.ravel() / n2, k.ravel() / n3])
    xc = np.asarray(c.m_x2c) @ xf
    fn = f.eval_fn(nder=nder)
    N = xc.shape[1]
    if N % block:
        pad = block - N % block
        xc = np.concatenate([xc, xc[:, -1:].repeat(pad, 1)], axis=1)
    outs = [fn(jnp.asarray(xc[:, lo:lo + block]))[0]
            for lo in range(0, xc.shape[1], block)]
    return jnp.concatenate(outs)[:N].reshape(shape)


def _rasterize_env(crystal, env, shape, block: int = 1 << 16):
    """Core-density grid from a PromolEnv (reference promolecular_grid,
    src/crystalmod@proc.f90:5118)."""
    from ..fields.promol import promolecular_soa

    n1, n2, n3 = shape
    i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                          indexing="ij")
    xf = np.stack([i.ravel() / n1, j.ravel() / n2, k.ravel() / n3])
    xc = np.asarray(crystal.m_x2c) @ xf
    N = xc.shape[1]
    out = np.empty(N)
    for lo in range(0, N, block):
        chunk = jnp.asarray(xc[:, lo:lo + block])
        out[lo:lo + chunk.shape[1]] = np.asarray(
            promolecular_soa(chunk, env.atpos, env.atspc, env.tab, nder=0)[0])
    return jnp.asarray(out.reshape(shape))
