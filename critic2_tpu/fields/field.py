"""Polymorphic scalar field with batched evaluation.

Role of the reference fieldmod (src/fieldmod.f90): a field is a crystal
plus one evaluation backend (grid / promolecular / wavefunction / ghost
expression), evaluated through a single dispatch `grd` that returns value,
gradient, Hessian and derived scalars - here for a whole batch of points in
one device program (reference grd, src/fieldmod@proc.f90:613-845).

Pipeline per batch (mirrors the reference exactly):
  1. Cartesian -> fractional, wrap to the main cell (periodic)
  2. backend evaluation (device)
  3. rotate grid-frame derivatives to Cartesian (m_c2x^T sandwiches)
  4. optional core augmentation (promolecular core tables, zpsp)
  5. nucleus clamp: zero the gradient on nuclei
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import jax
import jax.numpy as jnp
import numpy as np

from .. import param
from .grid3 import Grid3
from .promol import PromolEnv


@dataclass
class ScalarBatch:
    """Struct-of-arrays result of a batched field evaluation (role of the
    reference scalar_value, src/types.f90:113-148)."""

    f: jnp.ndarray              # (N,) value (with core if usecore)
    gf: jnp.ndarray             # (N,3) gradient
    hf: jnp.ndarray             # (N,3,3) hessian
    fval: jnp.ndarray           # (N,) valence-only value
    isnuc: jnp.ndarray          # (N,) bool

    @property
    def gfmod(self):
        return jnp.sqrt((self.gf * self.gf).sum(-1))

    @property
    def del2f(self):
        return self.hf[..., 0, 0] + self.hf[..., 1, 1] + self.hf[..., 2, 2]


_FORI_GATHER_OK: bool | None = None


def _fori_gather_ok() -> bool:
    """One-time backend self-check gating the fori-loop stepper default
    for gather-based field evaluators (round-3 advisor finding).

    The 2026-08 v5e backend class miscompiled lax loop bodies whose
    gather indices evolve with the carried state: Newton/ODE on grid
    fields reported convergence to 1e-12 while the post-hoc |grad| was
    up to 3e-2 — a silent wrong-answer mode. This check runs a tiny
    state-evolving-gather iteration (both scattered-stencil and
    row-gather tricubic paths, the two used by grid-field Newton/ODE)
    through lax.fori_loop and compares against the same steps dispatched
    one-by-one outside the loop (the form that was always correct). Any
    mismatch flips the grid-field default back to Python-unrolled
    chunks. The result is cached per process and on disk per
    (backend, jax version) so the small compile happens once per
    environment, not once per run."""
    global _FORI_GATHER_OK
    if _FORI_GATHER_OK is not None:
        return _FORI_GATHER_OK
    import os
    import tempfile

    backend = jax.default_backend()
    marker = os.path.join(
        tempfile.gettempdir(),
        f"critic2_tpu_fori_selfcheck_{backend}_{jax.__version__}")
    try:
        with open(marker) as fh:
            _FORI_GATHER_OK = fh.read().strip() == "ok"
            return _FORI_GATHER_OK
    except OSError:
        pass

    from functools import partial

    from ..ops.interp import interp_soa, interp_soa_rows

    try:
        idx = np.arange(8)
        g = jnp.asarray(
            2.0 + np.cos(2 * np.pi * idx / 8)[:, None, None]
            * np.cos(2 * np.pi * idx / 8)[None, :, None]
            + 0.5 * np.sin(2 * np.pi * idx / 8)[None, None, :])
        x0 = jnp.asarray(np.stack(np.meshgrid(
            *[np.linspace(0.07, 0.93, 4)] * 3, indexing="ij"),
            0).reshape(3, -1))

        def step(interp, xT):
            _, yp, _ = interp(g, xT, nder=1)
            xT = xT + 0.06 * jnp.tanh(yp)
            return xT - jnp.floor(xT)

        ok = True
        for interp in (partial(interp_soa, mode="tricubic"),
                       interp_soa_rows):
            fori = jax.jit(lambda xT, f=interp: jax.lax.fori_loop(
                0, 6, lambda i, x: step(f, x), xT))
            once = jax.jit(lambda xT, f=interp: step(f, xT))
            xa = np.asarray(fori(x0))
            xb = x0
            for _ in range(6):
                xb = once(xb)
            if not np.allclose(xa, np.asarray(xb), rtol=0, atol=1e-10):
                ok = False
                break
    except Exception:
        # the check itself failing is an unrelated breakage; keep the
        # measured-good default rather than silently changing behavior
        ok = True
    else:
        try:
            with open(marker, "w") as fh:
                fh.write("ok" if ok else "bad")
        except OSError:
            pass
    if not ok:
        import warnings

        warnings.warn(
            "critic2_tpu: lax loop bodies with state-evolving gathers "
            "do not round-trip on this backend; grid-field Newton/ODE "
            "fall back to unrolled chunk steppers (slower compiles). "
            "Set CRITIC2_TPU_UNROLL_LOOPS=1 to silence this check.")
    _FORI_GATHER_OK = ok
    return ok


def _ghost_derivs(expr_fn, xT, nder):
    """Value/gradient/Hessian of a batched scalar closure via autodiff.

    Points are independent, so d(sum_n f)/dxT = per-point gradients and
    three jvp passes of the gradient give the Hessian columns."""
    import jax

    f = expr_fn(xT)
    N = xT.shape[1]
    z3 = jnp.zeros((3, N), f.dtype)
    z6 = jnp.zeros((6, N), f.dtype)
    if nder < 1:
        return f, z3, z6
    gsum = lambda x: expr_fn(x).sum()  # noqa: E731
    gf = jax.grad(gsum)(xT)
    if nder < 2:
        return f, gf, z6
    gradfn = jax.grad(gsum)
    cols = []
    for i in range(3):
        tang = jnp.zeros_like(xT).at[i, :].set(1.0)
        cols.append(jax.jvp(gradfn, (xT,), (tang,))[1])  # (3, N) = H[:, i]
    h = jnp.stack(cols)                                   # (i, j, N)
    h6 = jnp.stack([h[0, 0], h[1, 1], h[2, 2], h[0, 1], h[0, 2], h[1, 2]])
    return f, gf, h6


@dataclass
class Field:
    crystal: object
    type: str       # 'grid' | 'promol' | 'wfn' | 'ghost' | 'wien' | 'elk'
    grid: Grid3 | None = None
    promol: PromolEnv | None = None
    wfn: object | None = None
    mt: object = None               # muffin-tin evaluator (wien/elk)
    pi: object = None               # aiPI STO evaluator
    dftb: object = None             # DFTB+ SK-basis evaluator
    expr: object = None             # compiled ghost expression
    name: str = ""
    usecore: bool = False
    zpsp: dict = dfield(default_factory=dict)
    typnuc: int = -3
    _coreenv: PromolEnv | None = None
    _evalfns: dict = dfield(default_factory=dict)

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @classmethod
    def promolecular(cls, crystal, name="rho0", fragment=None) -> "Field":
        return cls(crystal=crystal, type="promol",
                   promol=PromolEnv(crystal, fragment=fragment), name=name)

    @classmethod
    def from_grid(cls, crystal, grid: Grid3, name="", **kw) -> "Field":
        return cls(crystal=crystal, type="grid", grid=grid, name=name, **kw)

    @classmethod
    def ghost(cls, crystal, expr_fn, name="ghost") -> "Field":
        """Expression-backed field (reference ghost fields): expr_fn is a
        compiled batched closure xT (3, N) -> (N,). Derivatives come from
        JAX autodiff instead of the reference's Richardson numerical
        differences (src/fieldmod@proc.f90:932-1135)."""
        return cls(crystal=crystal, type="ghost", expr=expr_fn, name=name)

    @classmethod
    def from_file(cls, crystal, path: str, fmt: str | None = None,
                  name: str = "", **kw) -> "Field":
        from .grid3 import detect_grid_format

        if fmt is None:
            try:
                fmt = detect_grid_format(path)
            except ValueError:
                fmt = None
        if fmt in ("cube", "bincube", "vasp", "xsf", "qub", "elk",
                   "siesta", "pwc", "abinit"):
            omega = crystal.volume if fmt == "vasp" else None
            g = Grid3.from_file(path, fmt=fmt, omega=omega)
            if fmt == "pwc":
                chk = kw.pop("file2", None)
                chkdn = kw.pop("file3", None)
                if chk:
                    g.read_wannier_chk(chk, chkdn)
            return cls.from_grid(crystal, g, name=name or path, **kw)
        import os as _os
        base = _os.path.basename(path).upper()
        if base.startswith("STATE") and base.endswith(".OUT"):
            from .elk import ElkField

            geom = kw.pop("file2", None)
            if geom is None:
                geom = _os.path.join(_os.path.dirname(path), "GEOMETRY.OUT")
                if not _os.path.exists(geom):
                    raise FileNotFoundError(
                        f"elk field {path} needs GEOMETRY.OUT (pass file2=)")
            return cls(crystal=crystal, type="elk",
                       mt=ElkField.from_files(path, geom),
                       name=name or path, **kw)
        if base == "DETAILED.XML" or fmt == "dftb":
            from .dftb import DftbField

            binf = kw.pop("file2", None)
            hsdf = kw.pop("file3", None)
            if binf is None:
                binf = _os.path.join(_os.path.dirname(path),
                                     "eigenvec.bin")
            if hsdf is None:
                raise ValueError("dftb field needs the wfc .hsd basis "
                                 "file (LOAD detailed.xml eigenvec.bin "
                                 "wfc.hsd)")
            return cls(crystal=crystal, type="dftb",
                       dftb=DftbField.from_files(crystal, path, binf,
                                                 hsdf),
                       name=name or path, **kw)
        low = path.lower()
        if low.endswith((".clmsum", ".clmup", ".clmdn")) or fmt == "wien":
            from .wien import WienField

            struct = kw.pop("file2", None)
            if struct is None:
                import os
                base = os.path.splitext(path)[0]
                struct = base + ".struct"
                if not os.path.exists(struct):
                    raise FileNotFoundError(
                        f"wien field {path} needs a .struct file "
                        f"(tried {struct}; pass file2=)")
            return cls(crystal=crystal, type="wien",
                       mt=WienField.from_files(path, struct),
                       name=name or path, **kw)
        from .wfn import Wavefunction

        wfn = Wavefunction.from_file(path)
        # molecules live in a shifted internal frame (molx0); move the
        # wavefunction into it so all evaluations share one frame
        if crystal.ismolecule and crystal.molx0 is not None:
            wfn.atpos = wfn.atpos - np.asarray(crystal.molx0)
            wfn._dev = {}
        return cls(crystal=crystal, type="wfn", wfn=wfn, name=name or path, **kw)

    # ------------------------------------------------------------------
    def set_options(self, interp: str | None = None, core: bool | None = None,
                    zpsp: dict | None = None):
        if interp is not None and self.grid is not None:
            self.grid.setmode(interp)
        if zpsp is not None:
            self.zpsp = dict(zpsp)
        if core is not None:
            self.usecore = core
        self._evalfns.clear()       # captured constants changed
        self._coreenv = None
        return self

    @property
    def coreenv(self) -> PromolEnv | None:
        if not (self.usecore and self.zpsp):
            return None
        if self._coreenv is None:
            self._coreenv = PromolEnv(self.crystal, zpsp=self.zpsp)
        return self._coreenv

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def grd(self, points_cart, nder: int = 2, periodic: bool = True) -> ScalarBatch:
        """Batched field evaluation at Cartesian points (N, 3)."""
        c = self.crystal
        v = jnp.atleast_2d(jnp.asarray(points_cart, dtype=jnp.float64))
        m_c2x = jnp.asarray(c.m_c2x)
        m_x2c = jnp.asarray(c.m_x2c)
        wx = v @ m_c2x.T
        if periodic:
            wx = wx - jnp.floor(wx)
        wc = wx @ m_x2c.T

        if self.type == "grid":
            y, yp_frac, ypp_frac = self.grid.interp(wx, nder=nder)
            # rotate to Cartesian (reference :741-742): gf = c2x^T yp,
            # hf = c2x^T ypp c2x
            gf = yp_frac @ m_c2x
            hf = jnp.einsum("ki,nkl,lj->nij", m_c2x, ypp_frac, m_c2x)
            f = y
        elif self.type == "promol":
            f, gf, hf = self.promol.eval(wc, nder=nder)
        elif self.type == "wfn":
            f, gf, hf = self.wfn.rho_eval(v, nder=nder)  # molecules: no wrap
        elif self.type in ("wien", "elk"):
            from ..ops.interp import sym6_to_mat

            f, gfT, h6 = self.mt.grd(wc, nder=nder)
            if nder < 1:
                gfT = jnp.zeros((3, wc.shape[0]))
                h6 = jnp.zeros((6, wc.shape[0]))
            gf = gfT.T
            hf = sym6_to_mat(h6)
        elif self.type == "pi":
            f, gf, hf = self.pi.eval(wc, nder=nder)
        elif self.type == "dftb":
            f, gf, hf, _ = self.dftb.eval(wc, nder=nder)
        elif self.type == "ghost":
            from ..ops.interp import sym6_to_mat

            f, gfT, h6 = _ghost_derivs(self.expr, v.T, nder)
            gf = gfT.T
            hf = sym6_to_mat(h6)
        else:
            raise ValueError(f"unknown field type {self.type}")

        fval = f
        env = self.coreenv
        if env is not None:
            cf, cg, ch = env.eval(wc, nder=nder)
            f = f + cf
            gf = gf + cg
            hf = hf + ch

        # nucleus clamp (reference :836-838)
        isnuc = self._near_nucleus(wc)
        gf = jnp.where(isnuc[:, None], 0.0, gf)

        return ScalarBatch(f=f, gf=gf, hf=hf, fval=fval, isnuc=isnuc)

    def _near_nucleus(self, wc, eps: float = 1e-5):
        """Mask of points within eps of a nucleus (periodic), on device."""
        c = self.crystal
        at = np.asarray(c.x_cart)
        if len(at) == 0:
            return jnp.zeros(wc.shape[0], dtype=bool)
        # check a 3x3x3 image block around each atom (points are wrapped to
        # the main cell so immediate neighbors suffice)
        if c.ismolecule:
            imgs = at
        else:
            shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                               for k in (-1, 0, 1)], dtype=float)
            imgs = (at[None, :, :] + (shifts @ np.asarray(c.m_x2c).T)[:, None, :]
                    ).reshape(-1, 3)
        imgs = jnp.asarray(imgs)
        d2 = ((wc[:, None, :] - imgs[None, :, :]) ** 2).sum(-1)
        return d2.min(axis=1) < eps * eps

    def grd0(self, points_cart, periodic: bool = True):
        return self.grd(points_cart, nder=0, periodic=periodic).f

    # ------------------------------------------------------------------
    def eval_fn(self, nder: int = 2, clamp_nuclei: bool = True):
        """A pure jittable SoA closure xT (3, N) cart -> (f (N,), gf (3, N),
        h6 (6, N)) over captured device constants - the evaluation core
        consumed by the batched Newton/ODE/NCI kernels.

        Batch-last layout keeps every intermediate lane-dense on TPU (see
        ops/interp.py docstring); the Hessian rotation to Cartesian is one
        (6, 6) matmul against the components (sym6_rotation of m_c2x).

        The closure is CACHED per (nder, clamp_nuclei): jit caches key on
        the function object, so handing out a fresh closure per driver
        call would force a full recompile every call (seconds each
        through the remote-compile tunnel).
        """
        key = (nder, clamp_nuclei)
        cached = self._evalfns.get(key)
        if cached is not None:
            return cached
        fn = self._build_eval_fn(nder, clamp_nuclei)
        self._evalfns[key] = fn
        return fn

    def _build_eval_fn(self, nder: int, clamp_nuclei: bool):
        c = self.crystal
        m_c2x = jnp.asarray(c.m_c2x)
        m_x2c = jnp.asarray(c.m_x2c)
        from ..ops.eig3 import linmap, sym6_rotation
        m_c2x_np = np.asarray(c.m_c2x)
        m_x2c_np = np.asarray(c.m_x2c)
        r6_np = sym6_rotation(c.m_c2x)

        imgsT = None
        if clamp_nuclei and c.ncel > 0:
            at = np.asarray(c.x_cart)
            if c.ismolecule:
                imgsT = jnp.asarray(at.T)
            else:
                shifts = np.array(
                    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                     for k in (-1, 0, 1)], dtype=float)
                imgsT = jnp.asarray(
                    (at[None, :, :] + (shifts @ np.asarray(c.m_x2c).T)[:, None, :]
                     ).reshape(-1, 3).T)

        ftype = self.type
        grid_mode = self.grid.mode if ftype == "grid" else None
        promol = self.promol
        wfn = self.wfn
        mtfield = self.mt
        pifield = self.pi
        dftbfield = self.dftb
        expr_fn = self.expr
        env = self.coreenv

        # Big device arrays travel as ARGUMENTS (the `consts` pytree),
        # not closure captures: a closure-captured array is inlined into
        # the lowered StableHLO as a literal, so every jitted Newton/ODE
        # chunk over a 256^3 f64 grid field shipped a 134 MB MLIR
        # payload through the remote-compile tunnel (measured; it
        # OOM-killed the compile helper). Jitted consumers (ops/newton,
        # ops/ode) call fn._c2t_raw(consts, xT) with consts as a real
        # argument; fn(xT) stays the eager convenience form.
        consts: dict = {}
        if ftype == "grid":
            consts["grid_f"] = self.grid.f
            if grid_mode == "trispline":
                consts["spl"] = self.grid.spline_coeffs
            if grid_mode == "tristar":
                consts["starc2"] = self.grid.star_c2
        elif ftype == "promol":
            consts["p_atpos"] = promol.atpos
            consts["p_atspc"] = promol.atspc
            consts["p_tab"] = promol.tab
        if env is not None:
            consts["c_atpos"] = env.atpos
            consts["c_atspc"] = env.atspc
            consts["c_tab"] = env.tab
        if imgsT is not None:
            consts["imgsT"] = imgsT

        from ..ops.interp import interp_soa
        from .promol import promolecular_soa

        def raw(cst, xT):
            wx = linmap(m_c2x_np, xT)
            wx = wx - jnp.floor(wx)
            wc = linmap(m_x2c_np, wx)
            if ftype == "grid":
                grid_f = cst["grid_f"]
                if grid_mode == "trispline":
                    from ..ops.trispline import trispline_soa

                    y, yp, ypp6 = trispline_soa(cst["spl"], wx, nder=nder)
                elif grid_mode == "tristar":
                    from ..ops.trispline import trispline_star_soa

                    y, yp, ypp6 = trispline_star_soa(grid_f, cst["starc2"],
                                                     wx, nder=nder)
                else:
                    # scattered tricubic: on TPU the whole-row gather
                    # formulation beats the 64-element stencil gather
                    # (interp_soa_rows docstring has the measurements)
                    if (grid_mode == "tricubic"
                            and jax.devices()[0].platform != "cpu"
                            and wx.shape[1] >= 1024):
                        from ..ops.interp import interp_soa_rows

                        y, yp, ypp6 = interp_soa_rows(grid_f, wx,
                                                      nder=nder)
                    else:
                        y, yp, ypp6 = interp_soa(grid_f, wx,
                                                 mode=grid_mode,
                                                 nder=nder)
                gf = linmap(m_c2x_np.T, yp)
                h6 = linmap(r6_np, ypp6)
                f = y
            elif ftype == "promol":
                f, gf, h6 = promolecular_soa(
                    wc, cst["p_atpos"], cst["p_atspc"], cst["p_tab"],
                    nder=nder)
            elif ftype == "wfn":
                f, gf, h6 = wfn.rho_eval_soa(xT, nder=nder)
            elif ftype == "ghost":
                f, gf, h6 = _ghost_derivs(expr_fn, xT, nder)
            elif ftype in ("wien", "elk"):
                f, gf, h6 = mtfield.grd(wc.T, nder=nder)
                if nder < 1:
                    gf = jnp.zeros((3, wc.shape[1]))
                    h6 = jnp.zeros((6, wc.shape[1]))
            elif ftype == "pi":
                f, g, h = pifield.eval(wc.T, nder=nder)
                gf = g.T
                h6 = jnp.stack([h[:, 0, 0], h[:, 1, 1], h[:, 2, 2],
                                h[:, 0, 1], h[:, 0, 2], h[:, 1, 2]])
            elif ftype == "dftb":
                f, g, h, _ = dftbfield.eval(wc.T, nder=nder)
                gf = g.T
                h6 = jnp.stack([h[:, 0, 0], h[:, 1, 1], h[:, 2, 2],
                                h[:, 0, 1], h[:, 0, 2], h[:, 1, 2]])
            else:
                raise ValueError(f"eval_fn unsupported for type {ftype}")
            if env is not None:
                cf, cg, ch6 = promolecular_soa(
                    wc, cst["c_atpos"], cst["c_atspc"], cst["c_tab"],
                    nder=nder)
                f, gf, h6 = f + cf, gf + cg, h6 + ch6
            if imgsT is not None:
                d2 = ((wc[:, :, None] - cst["imgsT"][:, None, :]) ** 2).sum(0)
                isnuc = d2.min(axis=1) < 1e-10
                gf = jnp.where(isnuc[None, :], 0.0, gf)
            return f, gf, h6

        def fn(xT):
            return raw(consts, xT)

        fn._c2t_raw = raw
        fn._c2t_consts = consts
        # All evaluators iterate with lax.fori_loop/scan steppers: the
        # loop body (3 field evals for BS23) compiles once instead of
        # nsteps inlined copies.  History: until 2026-08-16 the v5e
        # backend in this environment miscompiled loop bodies whose
        # gather indices evolve with the carried state, forcing
        # Python-unrolled chunks for gather-based (grid) fields; on the
        # 2026-08-19 stack the fori/scan steppers bit-match the unrolled
        # ones on both scattered-stencil and row-gather interp paths
        # (ODE and Newton, verified on hardware), while the UNROLLED
        # form now OOM-kills the remote compile helper at >=16 inlined
        # evals over a 64^3 f64 grid.  CRITIC2_TPU_UNROLL_LOOPS=1
        # restores the old behavior for grid fields unconditionally;
        # otherwise gather-based evaluators run the one-time
        # state-evolving-gather self-check (_fori_gather_ok) and fall
        # back to unrolled chunks on any backend mismatch, so an
        # environment still running the miscompiling stack is detected
        # at runtime instead of silently producing wrong CP positions.
        import os

        gather_free = ftype == "wfn" and env is None
        if os.environ.get("CRITIC2_TPU_UNROLL_LOOPS"):
            fn._c2t_loop = "fori" if gather_free else "unroll"
        else:
            fn._c2t_loop = ("fori" if gather_free or _fori_gather_ok()
                            else "unroll")
        return fn
