"""Closed-form symmetric 3x3 eigen-decomposition, batched on device.

Replaces the reference's LAPACK calls in hot loops (eig/eigns and the
LINPACK dgeco/dgedi Hessian inverse of the Newton search,
src/fieldmod@proc.f90:1860, src/tools_math@proc.f90 eig/rsindex): TPU
batches need a branch-free closed form, not a host library.

Eigenvalues via the trigonometric solution of the characteristic cubic
(stable for symmetric matrices); eigenvectors via cross products of
shifted rows; inverse via the adjugate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["eigvalsh3", "eigh3", "inv3", "det3", "rsindex",
           "det3s", "solve3s", "eigvalsh3s", "sym6_rotation", "linmap"]


def linmap(A, v):
    """Apply a SMALL host-constant matrix A (m, k) to batched rows
    v (k, ...), unrolled into scalar multiply-adds.

    On TPU, tiny-by-huge f64 matmuls hit the emulated MXU path (measured
    3x slowdown of the full-grid sweep); unrolled scalar FMAs stay on the
    VPU and fuse with neighbors. Zero entries are skipped at trace time.
    """
    import numpy as np

    A = np.asarray(A)
    rows = []
    for i in range(A.shape[0]):
        acc = None
        for j in range(A.shape[1]):
            a = float(A[i, j])
            if a == 0.0:
                continue
            term = a * v[j]
            acc = term if acc is None else acc + term
        rows.append(acc if acc is not None else jnp.zeros_like(v[0]))
    return jnp.stack(rows)


def det3(m):
    """Determinant of (..., 3, 3)."""
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def inv3(m):
    """Inverse of (..., 3, 3) via the adjugate (batched, branch-free)."""
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]
    d = m[..., 1, 0]; e = m[..., 1, 1]; f = m[..., 1, 2]
    g = m[..., 2, 0]; h = m[..., 2, 1]; i = m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, D, G], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([C, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def det3s(h6):
    """Determinant of symmetric matrices in SYM6 component form (6, N)."""
    xx, yy, zz, xy, xz, yz = h6
    return (xx * (yy * zz - yz * yz) - xy * (xy * zz - yz * xz)
            + xz * (xy * yz - yy * xz))


def solve3s(h6, g):
    """Solve H x = g for symmetric H in SYM6 form.

    h6: (6, N); g: (3, N). Returns (x (3, N), det (N,)) via the adjugate -
    the batch-last replacement for the reference's dgeco/dgedi Newton
    solve (src/fieldmod@proc.f90:1860-1861). Caller divides/masks on det.
    """
    xx, yy, zz, xy, xz, yz = h6
    A = yy * zz - yz * yz
    B = -(xy * zz - yz * xz)
    C = xy * yz - yy * xz
    E = xx * zz - xz * xz
    F = -(xx * yz - xy * xz)
    I = xx * yy - xy * xy
    det = xx * A + xy * B + xz * C
    x0 = A * g[0] + B * g[1] + C * g[2]
    x1 = B * g[0] + E * g[1] + F * g[2]
    x2 = C * g[0] + F * g[1] + I * g[2]
    return jnp.stack([x0, x1, x2]), det


def eigvalsh3s(h6):
    """Eigenvalues (3, N) ascending of symmetric matrices in SYM6 form.

    Same trigonometric closed form as eigvalsh3, batch-last."""
    xx, yy, zz, xy, xz, yz = h6
    q = (xx + yy + zz) / 3.0
    da, db, dc = xx - q, yy - q, zz - q
    p2 = da * da + db * db + dc * dc + 2.0 * (xy * xy + yz * yz + xz * xz)
    p = jnp.sqrt(p2 / 6.0)
    safe_p = jnp.where(p > 0, p, 1.0)
    # normalize ELEMENTS by p before the determinant: dividing det by p^3
    # at the end underflows to 0/0 = NaN for near-isotropic matrices
    # (p ~ 1e-18 in f32 makes p^3 flush to zero)
    na, nb, nc = da / safe_p, db / safe_p, dc / safe_p
    nxy, nxz, nyz = xy / safe_p, xz / safe_p, yz / safe_p
    r = (na * (nb * nc - nyz * nyz) - nxy * (nxy * nc - nyz * nxz)
         + nxz * (nxy * nyz - nb * nxz)) / 2.0
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    lo = jnp.where(p > 0, e3, q)
    mid = jnp.where(p > 0, e2, q)
    hi = jnp.where(p > 0, e1, q)
    return jnp.stack([lo, mid, hi])


def sym6_rotation(M):
    """(6, 6) matrix R with (M^T H M) in SYM6 form = R @ h6.

    Host-side constant: precomputes the congruence-transform action on
    symmetric components so the fractional->Cartesian Hessian rotation
    (reference src/fieldmod@proc.f90:739-741) is one small matmul against
    a (6, N) batch.
    """
    import numpy as np

    SYM6 = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))
    M = np.asarray(M, dtype=float)
    R = np.zeros((6, 6))
    for col, (k, l) in enumerate(SYM6):
        E = np.zeros((3, 3))
        E[k, l] = 1.0
        E[l, k] = 1.0
        out = M.T @ E @ M
        for row, (i, j) in enumerate(SYM6):
            R[row, col] = out[i, j]
    return R


def eigvalsh3(m):
    """Eigenvalues of symmetric (..., 3, 3), ascending, closed form.

    Trigonometric solution (Smith's algorithm): exact-degeneracy safe.
    """
    a = m[..., 0, 0]; b = m[..., 1, 1]; c = m[..., 2, 2]
    d = m[..., 0, 1]; e = m[..., 1, 2]; f = m[..., 0, 2]
    q = (a + b + c) / 3.0
    da = a - q
    db = b - q
    dc = c - q
    p2 = da * da + db * db + dc * dc + 2.0 * (d * d + e * e + f * f)
    p = jnp.sqrt(p2 / 6.0)
    safe_p = jnp.where(p > 0, p, 1.0)
    # B = (m - q I)/p ; r = det(B)/2. Normalize ELEMENTS by p before the
    # determinant: dividing det by p^3 at the end underflows to 0/0 = NaN
    # for near-isotropic matrices (p ~ 1e-18 makes p^3 flush to zero)
    nda, ndb, ndc = da / safe_p, db / safe_p, dc / safe_p
    nd, ne, nf = d / safe_p, e / safe_p, f / safe_p
    r = (
        nda * (ndb * ndc - ne * ne)
        - nd * (nd * ndc - ne * nf)
        + nf * (nd * ne - ndb * nf)
    ) / 2.0
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    lo = jnp.where(p > 0, e3, q)
    mid = jnp.where(p > 0, e2, q)
    hi = jnp.where(p > 0, e1, q)
    return jnp.stack([lo, mid, hi], axis=-1)


def eigh3(m):
    """Eigenvalues (ascending) and eigenvectors of symmetric (..., 3, 3).

    Eigenvectors via cross products of rows of (m - lambda I); falls back
    between row pairs by magnitude for robustness near degeneracies.
    Returns (w (...,3), v (...,3,3)) with v[..., :, k] the k-th vector.
    """
    w = eigvalsh3(m)

    def vec(lam):
        mm = m - lam[..., None, None] * jnp.eye(3, dtype=m.dtype)
        r0 = mm[..., 0, :]
        r1 = mm[..., 1, :]
        r2 = mm[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = (c01 * c01).sum(-1)
        n02 = (c02 * c02).sum(-1)
        n12 = (c12 * c12).sum(-1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
        cand = jnp.stack([c01, c02, c12], axis=-2)
        v = jnp.take_along_axis(cand, best[..., None, None].repeat(3, -1), axis=-2)[
            ..., 0, :
        ]
        nrm = jnp.sqrt((v * v).sum(-1, keepdims=True))
        # degenerate direction: any unit vector orthogonal works; pick x-hat
        fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
        return jnp.where(nrm > 1e-30, v / jnp.where(nrm > 0, nrm, 1.0), fallback)

    v0 = vec(w[..., 0])
    v2 = vec(w[..., 2])
    # degeneracies can make v2 parallel to v0 (e.g. a multiple of the
    # identity); Gram-Schmidt against v0 with an orthogonal fallback keeps
    # the basis orthonormal and still satisfies the eigen-equation inside
    # the degenerate subspace.
    v2 = v2 - (v2 * v0).sum(-1, keepdims=True) * v0
    n2 = jnp.sqrt((v2 * v2).sum(-1, keepdims=True))
    pick = jnp.argmin(jnp.abs(v0), axis=-1)
    e = jax.nn.one_hot(pick, 3, dtype=m.dtype)
    alt = jnp.cross(v0, e)
    alt = alt / jnp.sqrt((alt * alt).sum(-1, keepdims=True))
    v2 = jnp.where(n2 > 1e-12, v2 / jnp.where(n2 > 0, n2, 1.0), alt)
    # middle vector: orthogonal completion keeps the basis orthonormal even
    # for (near-)degenerate pairs
    v1 = jnp.cross(v2, v0)
    n1 = jnp.sqrt((v1 * v1).sum(-1, keepdims=True))
    v1 = jnp.where(n1 > 1e-30, v1 / jnp.where(n1 > 0, n1, 1.0),
                   jnp.zeros_like(v1).at[..., 1].set(1.0))
    v = jnp.stack([v0, v1, v2], axis=-1)
    return w, v


def rsindex(hess, eps: float = 1e-12):
    """Rank and signature of symmetric Hessian(s) (reference rsindex,
    src/tools_math@proc.f90:871): r = #(|eig|>eps), s = #pos - #neg.

    Returns (eigs, r, s)."""
    w = eigvalsh3(hess)
    npos = (w > eps).sum(axis=-1)
    nneg = (w < -eps).sum(axis=-1)
    return w, npos + nneg, npos - nneg
