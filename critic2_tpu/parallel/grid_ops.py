"""Sharded whole-grid pipeline: distributed FFT operators, the fused
NCI sweep, and basin-weighted reductions over a slab-sharded grid.

The reference runs its whole-grid workloads as OpenMP loops over one
shared-memory array: the FFT-derived grids (laplacian/gradrho/hxx/pot,
src/grid3mod@proc.f90:1075-1439), the NCI box sweep
(src/nci@proc.f90:496-562) and the basin property sums
(src/integration@proc.f90:949-1178). Here each becomes a `shard_map`
program over the "space" axis of the device mesh:

 - grids are slab-sharded along axis 0 (PartitionSpec("space", None, None));
 - the 3-D FFT is the classic transpose algorithm: local FFT over axes
   (1,2), `lax.all_to_all` re-shard (axis 1 scattered, axis 0 gathered),
   local FFT over axis 0 - the transpose is the only collective and it
   rides ICI;
 - k-space scalings are built from 1-D frequency vectors per shard, so
   no (n1,n2,n3,3) G-vector tensor is ever materialized;
 - the NCI sweep is elementwise per slab after the FFT grids exist;
 - basin reductions are `psum`s of per-shard segment sums.

Dtype policy matches ops/fft.py: on TPU f64 grids run the FFT in
complex64 (no complex128 on TPU); on CPU meshes full f64 is kept.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["ShardedGridOps", "basin_reduce_sharded"]


def _recip_columns(m_x2c):
    """Reciprocal basis B (3,3) with G = kx B[:,0] + ky B[:,1] + kz B[:,2]."""
    m = np.asarray(m_x2c, dtype=float)
    vol = abs(np.linalg.det(m))
    b = np.empty((3, 3))
    b[:, 0] = np.cross(m[:, 1], m[:, 2])
    b[:, 1] = np.cross(m[:, 2], m[:, 0])
    b[:, 2] = np.cross(m[:, 0], m[:, 1])
    return b * (2.0 * np.pi / vol), vol


class ShardedGridOps:
    """FFT grid operators over a slab-sharded grid.

    Arrays enter and leave slab-sharded over the mesh's "space" axis
    (replicated over other axes); pass numpy/DeviceArrays and they are
    placed automatically by jit.
    """

    def __init__(self, mesh, shape, m_x2c):
        self.mesh = mesh
        self.shape = tuple(int(v) for v in shape)
        n1, n2, n3 = self.shape
        self.nspace = mesh.shape["space"]
        if n1 % self.nspace or n2 % self.nspace:
            raise ValueError(
                f"grid axes 0/1 ({n1},{n2}) must divide the space axis "
                f"({self.nspace}) for the transpose FFT")
        b, vol = _recip_columns(m_x2c)
        self._b = b
        self.vol = vol
        # integer FFT frequencies, host constants
        self._k1 = np.fft.fftfreq(n1, d=1.0 / n1)
        self._k2 = np.fft.fftfreq(n2, d=1.0 / n2)
        self._k3 = np.fft.fftfreq(n3, d=1.0 / n3)
        self._slab = NamedSharding(mesh, P("space", None, None))
        self._jits = {}

    # -- distributed FFT core (inside shard_map) --------------------

    def _fwd(self, slab, cdtype):
        """slab (m, n2, n3) real -> middle rep (n1, c2, n3) complex."""
        fk = jnp.fft.fftn(slab.astype(cdtype), axes=(1, 2))
        fk = lax.all_to_all(fk, "space", split_axis=1, concat_axis=0,
                            tiled=True)
        return jnp.fft.fft(fk, axis=0)

    def _bwd(self, fk):
        """middle rep -> real slab (m, n2, n3)."""
        f = jnp.fft.ifft(fk, axis=0)
        f = lax.all_to_all(f, "space", split_axis=0, concat_axis=1,
                           tiled=True)
        return jnp.real(jnp.fft.ifftn(f, axes=(1, 2)))

    def _gcomp(self, a, rdtype):
        """Cartesian G component a on the middle rep, (n1, c2, n3)."""
        n2 = self.shape[1]
        c2 = n2 // self.nspace
        r = lax.axis_index("space")
        k1 = jnp.asarray(self._k1, rdtype)
        k2 = lax.dynamic_slice(jnp.asarray(self._k2, rdtype),
                               (r * c2,), (c2,))
        k3 = jnp.asarray(self._k3, rdtype)
        # cast the numpy-f64 basis scalars: under x64 they silently
        # promote f32 -> f64 -> c128, which the TPU FFT rejects
        b = np.asarray(self._b, dtype=rdtype)
        return (k1[:, None, None] * b[a, 0] + k2[None, :, None] * b[a, 1]
                + k3[None, None, :] * b[a, 2])

    def _cdtype(self, f_dtype):
        if (jax.devices()[0].platform != "cpu"
                and f_dtype == jnp.float64):
            return jnp.complex64
        return jnp.complex128 if f_dtype == jnp.float64 else jnp.complex64

    # -- public operators --------------------------------------------

    def _run(self, name, kernel, f, n_out=1):
        """jit-cached shard_map slab->slab(s) program."""
        key = (name, jnp.asarray(f).dtype)
        if key not in self._jits:
            out_spec = (P("space", None, None) if n_out == 1 else
                        tuple(P("space", None, None)
                              for _ in range(n_out)))
            fn = jax.shard_map(
                kernel, mesh=self.mesh,
                in_specs=(P("space", None, None),),
                out_specs=out_spec, check_vma=False)
            self._jits[key] = jax.jit(fn)
        return self._jits[key](jax.device_put(jnp.asarray(f), self._slab))

    def laplacian(self, f):
        """del^2 f (reference laplacian, src/grid3mod@proc.f90:1075)."""
        def kern(slab):
            dt = slab.dtype
            fk = self._fwd(slab, self._cdtype(dt))
            rd = fk.real.dtype
            g2 = sum(self._gcomp(a, rd) ** 2 for a in range(3))
            return self._bwd(-g2 * fk).astype(dt)
        return self._run("lap", kern, f)

    def grad_components(self, f):
        """Cartesian gradient components, tuple of 3 slab-sharded grids."""
        def kern(slab):
            dt = slab.dtype
            fk = self._fwd(slab, self._cdtype(dt))
            rd = fk.real.dtype
            return tuple(
                self._bwd(1j * self._gcomp(a, rd) * fk).astype(dt)
                for a in range(3))
        return self._run("gradc", kern, f, n_out=3)

    def gradrho(self, f):
        """|grad f| (reference gradrho, src/grid3mod@proc.f90:1164)."""
        def kern(slab):
            dt = slab.dtype
            fk = self._fwd(slab, self._cdtype(dt))
            rd = fk.real.dtype
            acc = sum(self._bwd(1j * self._gcomp(a, rd) * fk) ** 2
                      for a in range(3))
            return jnp.sqrt(acc).astype(dt)
        return self._run("gradrho", kern, f)

    def hxx(self, f, ix: int):
        """d2f/dx_ix^2 (reference hxx, src/grid3mod@proc.f90:1345)."""
        def kern(slab):
            dt = slab.dtype
            fk = self._fwd(slab, self._cdtype(dt))
            gi = self._gcomp(ix, fk.real.dtype)
            return self._bwd(-gi * gi * fk).astype(dt)
        return self._run(f"hxx{ix}", kern, f)

    def pot(self, f, isry: bool = False):
        """Hartree potential, V(G)=4 pi rho(G)/G^2, V(0)=0 (reference
        pot, src/grid3mod@proc.f90:1245; isry doubles to Rydberg)."""
        def kern(slab):
            dt = slab.dtype
            fk = self._fwd(slab, self._cdtype(dt))
            rd = fk.real.dtype
            g2 = sum(self._gcomp(a, rd) ** 2 for a in range(3))
            inv = jnp.where(g2 < 1e-12, 0.0,
                            4.0 * jnp.pi / jnp.where(g2 < 1e-12, 1.0, g2))
            v = self._bwd(inv * fk)
            return ((2.0 * v) if isry else v).astype(dt)
        return self._run(f"pot{isry}", kern, f)

    def nci_grids(self, f, rho_min: float = 1e-30):
        """Fused sharded NCI sweep (reference hot loop,
        src/nci@proc.f90:496-562): returns (rho, rdg, sl2rho) slabs where
        rdg = |grad|/(2 (3 pi^2)^(1/3) rho^(4/3)) and sl2rho =
        sign(lambda_2(H)) * rho from the FFT Hessian.
        """
        from ..ops.eig3 import eigvalsh3s

        def kern(slab):
            dt = slab.dtype
            fk = self._fwd(slab, self._cdtype(dt))
            rd = fk.real.dtype
            g = [self._gcomp(a, rd) for a in range(3)]
            gmod = jnp.sqrt(sum(self._bwd(1j * ga * fk) ** 2 for ga in g))
            # SYM6 order (xx, yy, zz, xy, xz, yz)
            pairs = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))
            h6 = jnp.stack([self._bwd(-g[a] * g[b] * fk).reshape(-1)
                            for a, b in pairs])
            lam = eigvalsh3s(h6)            # (3, m*n2*n3) ascending
            l2sign = jnp.sign(lam[1]).reshape(slab.shape)
            rho = jnp.abs(slab)
            rdg = (gmod.astype(dt)
                   / (2.0 * (3.0 * jnp.pi ** 2) ** (1.0 / 3.0)
                      * jnp.maximum(rho, rho_min) ** (4.0 / 3.0)))
            return rho, rdg, (l2sign.astype(dt) * rho)
        return self._run("nci", kern, f, n_out=3)


def basin_reduce_sharded(mesh, interior_label, bidx, Wb, nattr,
                         fields_flat):
    """Sharded YT/Bader property integration: for each integrand f,
    q[b] = sum_i w_i(b) f_i, with interior points one-hot on their label
    and boundary points weighted by columns of Wb (the reference's
    per-attractor OpenMP loop, src/integration@proc.f90:986-1178).

    interior_label: (N,) int32, -1 at boundary points.
    bidx: (N,) int32 column into Wb for boundary points (0 elsewhere).
    Wb: (nattr, Nb) dense boundary weights (replicated; small).
    fields_flat: (nf, N) stacked integrands.
    Returns (nf, nattr) on host.
    """
    nspace = mesh.shape["space"]
    N = interior_label.shape[0]
    if N % nspace:
        raise ValueError(f"N={N} not divisible by space={nspace}")

    def kern(lab, bi, Wb_, ff):
        interior = lab >= 0
        safe_lab = jnp.where(interior, lab, 0)
        qi = jax.vmap(lambda f: jax.ops.segment_sum(
            jnp.where(interior, f, 0.0), safe_lab,
            num_segments=nattr))(ff)                       # (nf, nattr)
        fb = jnp.where(~interior, ff, 0.0)                  # (nf, N_loc)
        contrib = jax.vmap(
            lambda f: jax.ops.segment_sum(
                f, jnp.where(~interior, bi, Wb_.shape[1]),
                num_segments=Wb_.shape[1] + 1)[:-1])(fb)    # (nf, Nb)
        qb = contrib @ Wb_.T                                # (nf, nattr)
        return lax.psum(qi + qb, "space")

    fn = jax.shard_map(
        kern, mesh=mesh,
        in_specs=(P("space"), P("space"), P(None, None), P(None, "space")),
        out_specs=P(None, None), check_vma=False)
    out = jax.jit(fn)(interior_label, bidx, Wb, fields_flat)
    return np.asarray(out)
