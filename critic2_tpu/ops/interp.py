"""Batched periodic grid interpolation on device (JAX).

TPU-native replacement for the reference's per-point interpolators
(src/grid3mod@proc.f90: grinterp_nearest :1633, grinterp_trilinear :1651,
grinterp_tricubic :1978). All functions take a batch of fractional
coordinates (N, 3) and return value / gradient / Hessian for the whole
batch in one device program; gradients are in fractional coordinates scaled
by the grid size (reference convention, src/grid3mod@proc.f90:2133-2140),
the Cartesian rotation happens in the field layer.

The tricubic interpolant: the reference uses the Lekien-Marsden 64x64
matrix with corner derivatives estimated by central differences. That
construction is *exactly* the separable tensor-product cubic-convolution
(Catmull-Rom) interpolant - the tensor polynomial satisfies all 64 LM
constraints and the LM system is nonsingular - so we evaluate it axis by
axis: 3x4 basis weights and a 4x4x4 stencil contraction per point, instead
of a 64x64 matvec. (Verified against an independently-built LM solve in
tests/test_interp.py.)

TPU layout: the hot entry point is `interp_soa`, which is batch-LAST
("structure of arrays"): points (3, N), gradient (3, N), Hessian as the
six components (xx, yy, zz, xy, xz, yz) in a (6, N) array. TPU memory is
tiled (sublane, lane) = (8, 128) over the LAST TWO axes, so batch-first
layouts like (N, 3, 3) or the (N, 4, 4, 4) stencil gather pad each tiny
trailing axis up to the tile and blow HBM up 32-113x; with N last, every
intermediate is lane-dense. `interp_batch` keeps the (N, ...) convention
for host-facing callers and wraps interp_soa.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["interp_batch", "interp_soa", "interp_soa_rows",
           "eval_at_nodes"]

# symmetric-component order used for all (6, N) Hessian SoA arrays
SYM6 = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))


def _catmull_rom_weights(t):
    """Catmull-Rom basis weights over stencil offsets (-1, 0, 1, 2).

    t: (...,) fractional position in the base cell, in [0, 1).
    Returns (w, dw, d2w): each (..., 4).
    """
    t2 = t * t
    t3 = t2 * t
    w = jnp.stack(
        [
            0.5 * (-t3 + 2.0 * t2 - t),
            0.5 * (3.0 * t3 - 5.0 * t2 + 2.0),
            0.5 * (-3.0 * t3 + 4.0 * t2 + t),
            0.5 * (t3 - t2),
        ],
        axis=-1,
    )
    dw = jnp.stack(
        [
            0.5 * (-3.0 * t2 + 4.0 * t - 1.0),
            0.5 * (9.0 * t2 - 10.0 * t),
            0.5 * (-9.0 * t2 + 8.0 * t + 1.0),
            0.5 * (3.0 * t2 - 2.0 * t),
        ],
        axis=-1,
    )
    d2w = jnp.stack(
        [
            0.5 * (-6.0 * t + 4.0),
            0.5 * (18.0 * t - 10.0),
            0.5 * (-18.0 * t + 8.0),
            0.5 * (6.0 * t - 2.0),
        ],
        axis=-1,
    )
    return w, dw, d2w


def _linear_weights(t):
    w = jnp.stack([1.0 - t, t], axis=-1)
    dw = jnp.stack([-jnp.ones_like(t), jnp.ones_like(t)], axis=-1)
    return w, dw


def _gather_stencil(f, i0, offsets):
    """Gather a cubic stencil around base indices.

    f: (n1, n2, n3) grid; i0: (N, 3) int base indices;
    offsets: 1-D int array of stencil offsets (e.g. [-1,0,1,2]).
    Returns (N, k, k, k) with k = len(offsets).
    """
    n = jnp.asarray(f.shape)
    idx = (i0[:, None, :] + offsets[None, :, None]) % n  # (N, k, 3)
    flat = (
        idx[:, :, None, None, 0] * (f.shape[1] * f.shape[2])
        + idx[:, None, :, None, 1] * f.shape[2]
        + idx[:, None, None, :, 2]
    )  # (N, k, k, k)
    return jnp.take(f.reshape(-1), flat.reshape(flat.shape[0], -1), axis=0).reshape(
        flat.shape
    )


def _axis2(g, w):
    """Contract stencil axis 2 of g (a, b, k, N) with w (k, N) -> (a, b, N)
    as fused broadcast-multiply-reduce (see tricubic comment on einsum)."""
    return (g * w[None, None, :, :]).sum(2)


def _axes01(a, wa, wb):
    """Contract axes 0, 1 of a (ka, kb, N) with wa (ka, N), wb (kb, N)."""
    return (a * (wa[:, None, :] * wb[None, :, :])).sum((0, 1))


def _gather_stencil_soa(f, i0T, offsets):
    """Batch-last stencil gather.

    f: (n1, n2, n3) grid; i0T: (3, N) int base indices; offsets: (k,).
    Returns (k, k, k, N) - lane dimension is the batch, so no tile padding.
    """
    k = len(offsets)
    i = (i0T[0][None, :] + offsets[:, None]) % f.shape[0]       # (k, N)
    j = (i0T[1][None, :] + offsets[:, None]) % f.shape[1]
    l = (i0T[2][None, :] + offsets[:, None]) % f.shape[2]
    flat = (i[:, None, None, :] * (f.shape[1] * f.shape[2])
            + j[None, :, None, :] * f.shape[2]
            + l[None, None, :, :])                               # (k,k,k,N)
    return jnp.take(f.reshape(-1), flat.reshape(-1), axis=0).reshape(
        k, k, k, flat.shape[-1])


@partial(jax.jit, static_argnames=("mode", "nder"))
def interp_soa(f, xfracT, mode: str = "tricubic", nder: int = 2):
    """Batch-last interpolation: xfracT is (3, N) fractional coords.

    Returns (y (N,), ypT (3, N), ypp6 (6, N)) with ypp6 in SYM6 component
    order; derivatives are d/d(frac) scaled by n per axis (reference
    convention, src/grid3mod@proc.f90:2133-2140). Every intermediate keeps
    the batch in the lane dimension (see module docstring).
    """
    f = jnp.asarray(f)
    xT = jnp.asarray(xfracT, dtype=f.dtype)
    n = jnp.asarray(f.shape, dtype=f.dtype)
    N = xT.shape[1]
    x = xT - jnp.floor(xT)  # wrap to [0,1), reference interp :1052

    zero3 = jnp.zeros((3, N), f.dtype)
    zero6 = jnp.zeros((6, N), f.dtype)

    if mode == "nearest":
        idx = jnp.mod(jnp.rint(x * n[:, None]).astype(jnp.int32),
                      jnp.asarray(f.shape, dtype=jnp.int32)[:, None])
        y = f.reshape(-1)[idx[0] * (f.shape[1] * f.shape[2])
                          + idx[1] * f.shape[2] + idx[2]]
        return y, zero3, zero6

    xg = x * n[:, None]
    i0 = jnp.floor(xg).astype(jnp.int32)
    t = xg - i0  # position within base cell, [0,1); (3, N)

    if mode == "trilinear":
        g = _gather_stencil_soa(f, i0, jnp.arange(0, 2))    # (2,2,2,N)
        w1, d1 = _linear_weights(t[0]); w1, d1 = w1.T, d1.T  # (2,N)
        w2, d2 = _linear_weights(t[1]); w2, d2 = w2.T, d2.T
        w3, d3 = _linear_weights(t[2]); w3, d3 = w3.T, d3.T
        a0 = _axis2(g, w3)
        y = _axes01(a0, w1, w2)
        if nder < 1:
            return y, zero3, zero6
        a1 = _axis2(g, d3)
        gx = _axes01(a0, d1, w2)
        gy = _axes01(a0, w1, d2)
        gz = _axes01(a1, w1, w2)
        yp = jnp.stack([gx, gy, gz]) * n[:, None]
        return y, yp, zero6

    if mode != "tricubic":
        raise ValueError(f"unknown interpolation mode {mode}")

    g = _gather_stencil_soa(f, i0, jnp.arange(-1, 3))       # (4,4,4,N)
    w1, d1, s1 = (a.T for a in _catmull_rom_weights(t[0]))   # each (4,N)
    w2, d2, s2 = (a.T for a in _catmull_rom_weights(t[1]))
    w3, d3, s3 = (a.T for a in _catmull_rom_weights(t[2]))

    # contract axis z first (separable Catmull-Rom). Broadcast-multiply +
    # reduce, NOT einsum: XLA lowers these tiny-contraction einsums to
    # dot_general batched over the lane axis, materializing (4,4,4,4,N)
    # temporaries (GBs) and running ~1000x below VPU speed; the explicit
    # form fuses into lane-dense elementwise code.
    a0 = _axis2(g, w3)
    y = _axes01(a0, w1, w2)
    if nder < 1:
        return y, zero3, zero6

    a1 = _axis2(g, d3)
    gx = _axes01(a0, d1, w2)
    gy = _axes01(a0, w1, d2)
    gz = _axes01(a1, w1, w2)
    yp = jnp.stack([gx, gy, gz]) * n[:, None]
    if nder < 2:
        return y, yp, zero6

    a2 = _axis2(g, s3)
    hxx = _axes01(a0, s1, w2)
    hyy = _axes01(a0, w1, s2)
    hzz = _axes01(a2, w1, w2)
    hxy = _axes01(a0, d1, d2)
    hxz = _axes01(a1, d1, w2)
    hyz = _axes01(a1, w1, d2)
    # scale ypp_ij by n_i * n_j (reference :2134-2140), SYM6 order
    nn = jnp.stack([n[0] * n[0], n[1] * n[1], n[2] * n[2],
                    n[0] * n[1], n[0] * n[2], n[1] * n[2]])
    ypp6 = jnp.stack([hxx, hyy, hzz, hxy, hxz, hyz]) * nn[:, None]
    return y, yp, ypp6


@partial(jax.jit, static_argnames=("nder", "chunk"))
def interp_soa_rows(f, xfracT, nder: int = 2, chunk: int = 8192):
    """Tricubic interpolation for scattered points via whole-row gathers.

    Same contract as interp_soa(mode="tricubic") but restructured for the
    TPU memory system: XLA lowers the 64-element scattered stencil gather
    of `_gather_stencil_soa` to a scalar-core loop (~0.7 M evals/s on a
    v5e - the "gather wall" of BASELINE.md). Here each point instead
    gathers its 16 whole (x,y) rows along z - row gathers move full
    128-lane vectors, which the TPU gathers efficiently - and the z-axis
    stencil becomes a DENSE contraction with a weight row that holds the
    4 Catmull-Rom weights scattered at the wrapped z positions (built by
    comparison against an iota, no gather). The x/y contraction reuses
    the separable kernels. Points are processed in `chunk` blocks via
    lax.map to bound the (chunk, 16, n3) row buffer.

    Costs n3/4 more HBM traffic than the minimal stencil but runs from
    contiguous vectors. Measured on a v5e (128k scattered points,
    256^3 grid, value+grad+Hessian): f32 6.7M evals/s vs 1.6M for
    interp_soa; f64 1.2M vs 0.8M.
    """
    f = jnp.asarray(f)
    n1, n2, n3 = f.shape
    frows = f.reshape(n1 * n2, n3)
    xT = jnp.asarray(xfracT, dtype=f.dtype)
    n = jnp.asarray(f.shape, dtype=f.dtype)
    N = xT.shape[1]

    Np = ((N + chunk - 1) // chunk) * chunk
    if Np != N:
        xT = jnp.pad(xT, ((0, 0), (0, Np - N)))
    offs = jnp.arange(-1, 3, dtype=jnp.int32)
    zio = jnp.arange(n3, dtype=jnp.int32)

    def eval_chunk(xcT):
        C = xcT.shape[1]
        x = xcT - jnp.floor(xcT)
        xg = x * n[:, None]
        i0 = jnp.floor(xg).astype(jnp.int32)
        t = xg - i0
        xi = (i0[0][:, None] + offs[None, :]) % n1            # (C, 4)
        yj = (i0[1][:, None] + offs[None, :]) % n2
        ridx = xi[:, :, None] * n2 + yj[:, None, :]           # (C, 4, 4)
        rows = jnp.take(frows, ridx.reshape(-1), axis=0).reshape(C, 16, n3)
        # dense z-stencil weights, periodic wrap built in. Contraction
        # form is dtype-adaptive (measured on v5e, 128k points/256^3):
        # f32 batched dot_general rides the MXU (6.7M evals/s vs 3.3M
        # fused); f64 has no MXU and the emulated dot collapses to
        # 0.18M, while broadcast-multiply + reduce on the VPU gives
        # 1.2M (old element-gather path: 0.8M).
        w3, d3, s3 = _catmull_rom_weights(t[2])               # (C, 4) each
        pos = (i0[2][:, None] + offs[None, :]) % n3           # (C, 4)
        onehot = (pos[:, :, None] == zio[None, None, :]).astype(f.dtype)
        if f.dtype == jnp.float32:
            wts = jnp.stack([w3, d3, s3], axis=1)             # (C, 3, 4)
            W = jax.lax.dot_general(wts, onehot,
                                    (((2,), (1,)), ((0,), (0,))))
            CC = jax.lax.dot_general(rows, W,
                                     (((2,), (2,)), ((0,), (0,))))
            a = CC.transpose(2, 1, 0).reshape(3, 4, 4, C)     # [w,i,j,C]
            a0, a1, a2 = a[0], a[1], a[2]
        else:
            def zmask(w):                                      # (C, 1, n3)
                return (w[:, :, None] * onehot).sum(1)[:, None, :]

            def zcontract(w):                                  # (C, 16)
                return (rows * zmask(w)).sum(-1)

            a0 = zcontract(w3).T.reshape(4, 4, C)              # [i, j, C]
            a1 = zcontract(d3).T.reshape(4, 4, C)
            a2 = zcontract(s3).T.reshape(4, 4, C)
        w1, d1, s1 = (v.T for v in _catmull_rom_weights(t[0]))  # (4, C)
        w2, d2, s2 = (v.T for v in _catmull_rom_weights(t[1]))
        y = _axes01(a0, w1, w2)
        gx = _axes01(a0, d1, w2)
        gy = _axes01(a0, w1, d2)
        gz = _axes01(a1, w1, w2)
        hxx = _axes01(a0, s1, w2)
        hyy = _axes01(a0, w1, s2)
        hzz = _axes01(a2, w1, w2)
        hxy = _axes01(a0, d1, d2)
        hxz = _axes01(a1, d1, w2)
        hyz = _axes01(a1, w1, d2)
        yp = jnp.stack([gx, gy, gz]) * n[:, None]
        nn = jnp.stack([n[0] * n[0], n[1] * n[1], n[2] * n[2],
                        n[0] * n[1], n[0] * n[2], n[1] * n[2]])
        ypp6 = jnp.stack([hxx, hyy, hzz, hxy, hxz, hyz]) * nn[:, None]
        return y, yp, ypp6

    ys, yps, ypp6s = jax.lax.map(eval_chunk,
                                 xT.reshape(3, Np // chunk, chunk)
                                 .transpose(1, 0, 2))
    y = ys.reshape(-1)[:N]
    yp = jnp.moveaxis(yps, 1, 0).reshape(3, -1)[:, :N]
    ypp6 = jnp.moveaxis(ypp6s, 1, 0).reshape(6, -1)[:, :N]
    if nder < 1:
        z = jnp.zeros_like
        return y, z(yp), z(ypp6)
    if nder < 2:
        return y, yp, jnp.zeros_like(ypp6)
    return y, yp, ypp6


@partial(jax.jit, static_argnames=("nout", "nder"))
def interp_grid_soa(f, nout, origin=(0.0, 0.0, 0.0),
                    lengths=(1.0, 1.0, 1.0), nder: int = 2):
    """Tricubic evaluation on a REGULAR output grid, separable fast path.

    The hot workloads (NCI boxes, CUBE maps, supersampled property grids)
    evaluate on regular grids; there the 4^3 stencil factorizes into three
    1-D passes of 4 whole-plane gathers + weighted sums per axis - coarse
    -grained memory access that runs at HBM bandwidth on TPU, ~1000x the
    scattered jnp.take path (fine-grained gathers serialize).

    f: (n1, n2, n3); nout: (m1, m2, m3) output shape; output node x_a =
    origin_a + i/m_a * lengths_a (fractional). Returns (y (m...),
    yp (3, m...), ypp6 (6, m...)) in the same derivative conventions as
    interp_soa.
    """
    f = jnp.asarray(f)
    n = f.shape
    m1, m2, m3 = (int(v) for v in nout)

    usemxu = f.dtype == jnp.float32    # f64 matmuls are emulated on the
    # v5e MXU (24M evals/s measured) while f64 plane-takes reach 119M;
    # f32 matmuls win (196M vs 121M). Pick the contraction engine by dtype.

    def axis_mats(a, m):
        """Weights per output index along axis a: dense banded (m, n_a)
        matrices (MXU path) or (idx, w) pairs (take path)."""
        xg = (origin[a] + jnp.arange(m) / m * lengths[a]) * n[a]
        xg = xg - jnp.floor(xg / n[a]) * n[a]
        i0 = jnp.floor(xg).astype(jnp.int32)
        t = xg - i0
        w, d, s = _catmull_rom_weights(t)          # each (m, 4)
        idx = (i0[:, None] + jnp.arange(-1, 3)[None, :]) % n[a]  # (m, 4)
        if not usemxu:
            return (idx, w), (idx, d * n[a]), (idx, s * n[a] * n[a])
        rows = jnp.broadcast_to(jnp.arange(m)[:, None], idx.shape)
        Z = jnp.zeros((m, n[a]), f.dtype)
        W = Z.at[rows, idx].add(w.astype(f.dtype))
        D = Z.at[rows, idx].add((d * n[a]).astype(f.dtype))
        S = Z.at[rows, idx].add((s * n[a] * n[a]).astype(f.dtype))
        return W, D, S

    W1, D1, S1 = axis_mats(0, m1)
    W2, D2, S2 = axis_mats(1, m2)
    W3, D3, S3 = axis_mats(2, m3)

    def _take(arr, axis, M):
        idx, wt = M
        out = None
        for tt in range(4):
            g = jnp.take(arr, idx[:, tt], axis=axis)
            shape = [1, 1, 1]
            shape[axis] = -1
            term = g * wt[:, tt].reshape(shape).astype(arr.dtype)
            out = term if out is None else out + term
        return out

    if usemxu:
        def c0(arr, M):    # axis 0: (m, n1) @ (n1, n2*n3)
            return jnp.einsum("ai,ijk->ajk", M, arr,
                              preferred_element_type=f.dtype)

        def c1(arr, M):    # axis 1
            return jnp.einsum("aj,ijk->iak", M, arr,
                              preferred_element_type=f.dtype)

        def c2(arr, M):    # axis 2 (lane axis -> matmul, never gather)
            return jnp.einsum("ak,ijk->ija", M, arr,
                              preferred_element_type=f.dtype)
    else:
        def c0(arr, M):
            return _take(arr, 0, M)

        def c1(arr, M):
            return _take(arr, 1, M)

        def c2(arr, M):
            return _take(arr, 2, M)

    aw = c0(f, W1)
    aww = c1(aw, W2)                    # (m1, m2, n3)
    y = c2(aww, W3)
    if nder < 1:
        z = jnp.zeros((3, m1, m2, m3), f.dtype)
        return y, z, jnp.zeros((6, m1, m2, m3), f.dtype)

    ad = c0(f, D1)
    awd = c1(aw, D2)
    adw = c1(ad, W2)
    gx = c2(adw, W3)
    gy = c2(awd, W3)
    gz = c2(aww, D3)
    yp = jnp.stack([gx, gy, gz])
    if nder < 2:
        return y, yp, jnp.zeros((6, m1, m2, m3), f.dtype)

    as_ = c0(f, S1)
    hxx = c2(c1(as_, W2), W3)
    hyy = c2(c1(aw, S2), W3)
    hzz = c2(aww, S3)
    hxy = c2(c1(ad, D2), W3)
    hxz = c2(adw, D3)
    hyz = c2(awd, D3)
    ypp6 = jnp.stack([hxx, hyy, hzz, hxy, hxz, hyz])
    return y, yp, ypp6


def sym6_to_mat(h6):
    """(6, N) SYM6 components -> (N, 3, 3) full matrices (host-facing)."""
    xx, yy, zz, xy, xz, yz = h6
    return jnp.stack(
        [jnp.stack([xx, xy, xz], -1),
         jnp.stack([xy, yy, yz], -1),
         jnp.stack([xz, yz, zz], -1)], axis=-2)


def mat_to_sym6(h):
    """(N, 3, 3) symmetric matrices -> (6, N) SYM6 components."""
    return jnp.stack([h[..., 0, 0], h[..., 1, 1], h[..., 2, 2],
                      h[..., 0, 1], h[..., 0, 2], h[..., 1, 2]])


@partial(jax.jit, static_argnames=("mode", "nder"))
def interp_batch(f, xfrac, mode: str = "tricubic", nder: int = 2):
    """Batch-first wrapper over interp_soa for host-facing callers.

    xfrac (N, 3) -> (y (N,), yp (N, 3), ypp (N, 3, 3)).
    """
    y, ypT, ypp6 = interp_soa(jnp.asarray(f), jnp.asarray(xfrac).T,
                              mode=mode, nder=nder)
    return y, ypT.T, sym6_to_mat(ypp6)


def eval_at_nodes(f, idx):
    """Exact node values at integer grid indices idx (N,3) (the nder==0
    near-grid shortcut of reference grd, src/fieldmod@proc.f90:728-737)."""
    f = jnp.asarray(f)
    idx = jnp.mod(idx, jnp.asarray(f.shape))
    return f[idx[:, 0], idx[:, 1], idx[:, 2]]
