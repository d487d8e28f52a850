// critic2-tpu native host kernels (C++17, C ABI for ctypes).
//
// Role of the reference's native C/F77 components (SURVEY.md S2.3):
//   - qhull (src/qhull/ + src/doqhull.c): convex-hull triangulation of
//     basin surfaces and Voronoi construction of the Wigner-Seitz cell
//     -> c2n_hull (incremental 3-D convex hull), c2n_ws_cell
//     (halfspace-intersection Voronoi cell of a lattice).
//   - the strictly-sequential Yu-Trinkle sweep (src/yt@proc.f90:106-190)
//     as a native host engine -> c2n_yt_labels: exact reference-order
//     basin assignment used to cross-check the device formulation on
//     grids too large for the Python sequential checker.
//
// Everything is plain C arrays; the Python side (critic2_tpu/native.py)
// loads this with ctypes and falls back to NumPy implementations.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <utility>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// incremental 3-D convex hull
// pts: n x 3 doubles. tris: output triangle vertex ids (max_tris x 3).
// returns number of triangles, or -1 on failure / overflow.
// ---------------------------------------------------------------------
int c2n_hull(int n, const double* pts, int* tris, int max_tris) {
    if (n < 4) return -1;
    struct Face { int a, b, c; bool alive; };
    auto at = [&](int i, int k) { return pts[3 * i + k]; };
    auto sub = [&](int i, int j, double* out) {
        for (int k = 0; k < 3; ++k) out[k] = at(i, k) - at(j, k);
    };
    auto orient = [&](int a, int b, int c, int d) {
        double u[3], v[3], w[3];
        sub(b, a, u); sub(c, a, v); sub(d, a, w);
        double nx = u[1] * v[2] - u[2] * v[1];
        double ny = u[2] * v[0] - u[0] * v[2];
        double nz = u[0] * v[1] - u[1] * v[0];
        return nx * w[0] + ny * w[1] + nz * w[2];
    };

    // initial non-degenerate tetrahedron
    int i0 = 0, i1 = -1, i2 = -1, i3 = -1;
    for (int i = 1; i < n && i1 < 0; ++i) {
        double d[3]; sub(i, i0, d);
        if (std::abs(d[0]) + std::abs(d[1]) + std::abs(d[2]) > 1e-12)
            i1 = i;
    }
    if (i1 < 0) return -1;
    for (int i = 1; i < n && i2 < 0; ++i) {
        if (i == i1) continue;
        double u[3], v[3]; sub(i1, i0, u); sub(i, i0, v);
        double cx = u[1] * v[2] - u[2] * v[1];
        double cy = u[2] * v[0] - u[0] * v[2];
        double cz = u[0] * v[1] - u[1] * v[0];
        if (cx * cx + cy * cy + cz * cz > 1e-20) i2 = i;
    }
    if (i2 < 0) return -1;
    for (int i = 1; i < n && i3 < 0; ++i) {
        if (i == i1 || i == i2) continue;
        if (std::abs(orient(i0, i1, i2, i)) > 1e-18) i3 = i;
    }
    if (i3 < 0) return -1;
    if (orient(i0, i1, i2, i3) > 0) std::swap(i1, i2);

    std::vector<Face> faces = {
        {i0, i1, i2, true}, {i0, i3, i1, true},
        {i1, i3, i2, true}, {i2, i3, i0, true}};

    for (int p = 0; p < n; ++p) {
        if (p == i0 || p == i1 || p == i2 || p == i3) continue;
        // find visible faces
        std::vector<int> vis;
        for (size_t f = 0; f < faces.size(); ++f) {
            if (!faces[f].alive) continue;
            if (orient(faces[f].a, faces[f].b, faces[f].c, p) > 1e-12)
                vis.push_back((int)f);
        }
        if (vis.empty()) continue;
        // horizon edges: edges of visible faces shared with non-visible
        std::vector<std::pair<int, int>> horizon;
        auto edge_visible = [&](int u, int v) {
            // is the directed edge (u,v) on some visible face?
            for (int f : vis) {
                const Face& F = faces[f];
                if ((F.a == u && F.b == v) || (F.b == u && F.c == v) ||
                    (F.c == u && F.a == v))
                    return true;
            }
            return false;
        };
        for (int f : vis) {
            const Face& F = faces[f];
            int e[3][2] = {{F.a, F.b}, {F.b, F.c}, {F.c, F.a}};
            for (auto& ed : e)
                if (!edge_visible(ed[1], ed[0]))
                    horizon.push_back({ed[0], ed[1]});
        }
        for (int f : vis) faces[f].alive = false;
        for (auto& ed : horizon)
            faces.push_back({ed.first, ed.second, p, true});
    }

    int nt = 0;
    for (auto& F : faces) {
        if (!F.alive) continue;
        if (nt >= max_tris) return -1;
        tris[3 * nt] = F.a; tris[3 * nt + 1] = F.b; tris[3 * nt + 2] = F.c;
        ++nt;
    }
    return nt;
}

// ---------------------------------------------------------------------
// Wigner-Seitz cell of a lattice (halfspace intersection vs the 3x3x3
// neighbor star). m: column-major 3x3 lattice matrix (columns = vectors).
// outputs: up to maxf facets: ineigh (3 ints, lattice vector), area;
// up to maxv vertices (x,y,z). returns number of facets, nv via pnv.
// ---------------------------------------------------------------------
int c2n_ws_cell(const double* m, int* ineigh, double* areas,
                double* verts, int* pnv, int maxf, int maxv) {
    // candidate neighbors: all nonzero (i,j,k) in [-2,2]^3 (covers very
    // skewed cells; the reference restricts to the Delaunay star)
    struct P { double x[3]; int h[3]; };
    std::vector<P> cand;
    for (int i = -2; i <= 2; ++i)
        for (int j = -2; j <= 2; ++j)
            for (int k = -2; k <= 2; ++k) {
                if (!i && !j && !k) continue;
                P p;
                p.h[0] = i; p.h[1] = j; p.h[2] = k;
                for (int d = 0; d < 3; ++d)
                    p.x[d] = i * m[d] + j * m[3 + d] + k * m[6 + d];
                cand.push_back(p);
            }
    const size_t nc = cand.size();
    std::vector<double> rhs(nc), nrm2(nc);
    double scale = 0.0;
    for (size_t i = 0; i < nc; ++i) {
        nrm2[i] = cand[i].x[0] * cand[i].x[0] + cand[i].x[1] * cand[i].x[1]
                + cand[i].x[2] * cand[i].x[2];
        rhs[i] = 0.5 * nrm2[i];
        scale = std::max(scale, nrm2[i]);
    }
    scale = std::sqrt(scale);
    const double eps = 1e-8 * scale * scale;

    // vertices: intersections of plane triples inside all halfspaces
    std::vector<std::array<double, 3>> V;
    for (size_t a = 0; a < nc; ++a)
        for (size_t b = a + 1; b < nc; ++b)
            for (size_t c = b + 1; c < nc; ++c) {
                double A[9] = {cand[a].x[0], cand[a].x[1], cand[a].x[2],
                               cand[b].x[0], cand[b].x[1], cand[b].x[2],
                               cand[c].x[0], cand[c].x[1], cand[c].x[2]};
                double det = A[0] * (A[4] * A[8] - A[5] * A[7])
                           - A[1] * (A[3] * A[8] - A[5] * A[6])
                           + A[2] * (A[3] * A[7] - A[4] * A[6]);
                if (std::abs(det) < 1e-10 * scale * scale * scale) continue;
                double bvec[3] = {rhs[a], rhs[b], rhs[c]};
                // Cramer
                double v[3];
                for (int col = 0; col < 3; ++col) {
                    double M2[9];
                    std::memcpy(M2, A, sizeof(M2));
                    M2[col] = bvec[0]; M2[3 + col] = bvec[1];
                    M2[6 + col] = bvec[2];
                    double d2 = M2[0] * (M2[4] * M2[8] - M2[5] * M2[7])
                              - M2[1] * (M2[3] * M2[8] - M2[5] * M2[6])
                              + M2[2] * (M2[3] * M2[7] - M2[4] * M2[6]);
                    v[col] = d2 / det;
                }
                bool inside = true;
                for (size_t q = 0; q < nc && inside; ++q)
                    if (cand[q].x[0] * v[0] + cand[q].x[1] * v[1]
                        + cand[q].x[2] * v[2] > rhs[q] + eps)
                        inside = false;
                if (!inside) continue;
                bool dup = false;
                for (auto& u : V) {
                    double dx = u[0] - v[0], dy = u[1] - v[1],
                           dz = u[2] - v[2];
                    if (dx * dx + dy * dy + dz * dz < 1e-12 * scale * scale)
                        { dup = true; break; }
                }
                if (!dup) V.push_back({v[0], v[1], v[2]});
            }
    if ((int)V.size() > maxv) return -1;
    *pnv = (int)V.size();
    for (size_t i = 0; i < V.size(); ++i)
        for (int d = 0; d < 3; ++d) verts[3 * i + d] = V[i][d];

    // facets: planes supporting >= 3 vertices; area by fan triangulation
    int nf = 0;
    for (size_t q = 0; q < nc; ++q) {
        std::vector<int> on;
        for (size_t i = 0; i < V.size(); ++i) {
            double s = cand[q].x[0] * V[i][0] + cand[q].x[1] * V[i][1]
                     + cand[q].x[2] * V[i][2];
            if (std::abs(s - rhs[q]) < 10 * eps) on.push_back((int)i);
        }
        if (on.size() < 3) continue;
        if (nf >= maxf) return -1;
        // order polygon by angle around the facet normal
        double n0 = std::sqrt(nrm2[q]);
        double nx = cand[q].x[0] / n0, ny = cand[q].x[1] / n0,
               nz = cand[q].x[2] / n0;
        double cx = 0, cy = 0, cz = 0;
        for (int i : on) { cx += V[i][0]; cy += V[i][1]; cz += V[i][2]; }
        cx /= on.size(); cy /= on.size(); cz /= on.size();
        // basis in the plane
        double ux, uy, uz;
        if (std::abs(nx) < 0.9) { ux = 1; uy = 0; uz = 0; }
        else { ux = 0; uy = 1; uz = 0; }
        double px = uy * nz - uz * ny, py = uz * nx - ux * nz,
               pz = ux * ny - uy * nx;
        double pn = std::sqrt(px * px + py * py + pz * pz);
        px /= pn; py /= pn; pz /= pn;
        double qx = ny * pz - nz * py, qy = nz * px - nx * pz,
               qz = nx * py - ny * px;
        std::vector<std::pair<double, int>> ang;
        for (int i : on) {
            double dx = V[i][0] - cx, dy = V[i][1] - cy, dz = V[i][2] - cz;
            ang.push_back({std::atan2(dx * qx + dy * qy + dz * qz,
                                      dx * px + dy * py + dz * pz), i});
        }
        std::sort(ang.begin(), ang.end());
        double area = 0.0;
        for (size_t t = 1; t + 1 < ang.size(); ++t) {
            int a0 = ang[0].second, a1 = ang[t].second,
                a2 = ang[t + 1].second;
            double e1[3] = {V[a1][0] - V[a0][0], V[a1][1] - V[a0][1],
                            V[a1][2] - V[a0][2]};
            double e2[3] = {V[a2][0] - V[a0][0], V[a2][1] - V[a0][1],
                            V[a2][2] - V[a0][2]};
            double crx = e1[1] * e2[2] - e1[2] * e2[1];
            double cry = e1[2] * e2[0] - e1[0] * e2[2];
            double crz = e1[0] * e2[1] - e1[1] * e2[0];
            area += 0.5 * std::sqrt(crx * crx + cry * cry + crz * crz);
        }
        ineigh[3 * nf] = cand[q].h[0];
        ineigh[3 * nf + 1] = cand[q].h[1];
        ineigh[3 * nf + 2] = cand[q].h[2];
        areas[nf] = area;
        ++nf;
    }
    return nf;
}

// ---------------------------------------------------------------------
// sequential Yu-Trinkle basin assignment (exact reference order,
// src/yt@proc.f90:106-190). rho: flattened n1*n2*n3 grid; offs: K x 3
// neighbor offsets; wts: K facet weights (A/l). outputs:
// labels (-1 boundary marker resolved to argmax basin), nattr.
// Weights of boundary points are accumulated into qout (nattr x nf
// integrands) for the nf fields fed in fields (nf x N, may be null).
// ---------------------------------------------------------------------
// Exact sequential Yu-Trinkle sweep (reference algorithm order,
// src/yt@proc.f90:106-190). Shared worker: fills labels and, when
// `field`/`charges` are non-null, accumulates the fractional-weight
// basin integrals sum_i w_i(b) * field_i -- the parity reference for
// the device formulation.
static int yt_sweep(int n1, int n2, int n3, const double* rho,
                    int K, const int* offs, const double* wts,
                    int* labels, int max_attr,
                    const double* field, double* charges) {
    const int64_t N = (int64_t)n1 * n2 * n3;
    std::vector<int64_t> order(N);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return rho[a] > rho[b]; });
    std::vector<int64_t> rank(N);
    for (int64_t r = 0; r < N; ++r) rank[order[r]] = r;

    // sparse boundary weights: per boundary point, map basin->w
    std::vector<std::vector<std::pair<int, double>>> wstore(N);
    int nattr = 0;
    std::vector<int64_t> nbr(K);
    for (int64_t rr = 0; rr < N; ++rr) {
        int64_t i = order[rr];
        int64_t x1 = i / ((int64_t)n2 * n3);
        int64_t rem = i - x1 * n2 * n3;
        int64_t x2 = rem / n3, x3 = rem - (int64_t)x2 * n3;
        int nhi = 0;
        double chisum = 0.0;
        int64_t kmin_nbr = -1;
        int64_t kmin_rank = N;
        std::vector<std::pair<int64_t, double>> chi;
        for (int k = 0; k < K; ++k) {
            int64_t y1 = (x1 + offs[3 * k] % n1 + n1) % n1;
            int64_t y2 = (x2 + offs[3 * k + 1] % n2 + n2) % n2;
            int64_t y3 = (x3 + offs[3 * k + 2] % n3 + n3) % n3;
            int64_t j = (y1 * n2 + y2) * n3 + y3;
            if (rank[j] < rank[i]) {
                ++nhi;
                if (rank[j] < kmin_rank) { kmin_rank = rank[j]; kmin_nbr = j; }
                double c = wts[k] * (rho[j] - rho[i]);
                if (c > 0) { chi.push_back({j, c}); chisum += c; }
            }
        }
        if (nhi == 0) {
            if (nattr >= max_attr) return -1;
            labels[i] = nattr;
            wstore[i] = {{nattr, 1.0}};
            ++nattr;
            continue;
        }
        if (chi.empty()) { chi.push_back({kmin_nbr, 1.0}); chisum = 1.0; }
        // accumulate weights from uphill neighbors
        std::vector<std::pair<int, double>> row;
        for (auto& [j, c] : chi) {
            double p = c / chisum;
            for (auto& [b, w] : wstore[j]) {
                bool found = false;
                for (auto& [b2, w2] : row)
                    if (b2 == b) { w2 += p * w; found = true; break; }
                if (!found) row.push_back({b, p * w});
            }
        }
        // label = argmax weight
        int best = -1; double bw = -1.0;
        for (auto& [b, w] : row)
            if (w > bw) { bw = w; best = b; }
        labels[i] = best;
        wstore[i] = std::move(row);
    }
    if (field && charges) {
        for (int b = 0; b < nattr; ++b) charges[b] = 0.0;
        for (int64_t i = 0; i < N; ++i)
            for (auto& [b, w] : wstore[i]) charges[b] += w * field[i];
    }
    return nattr;
}

int c2n_yt_labels(int n1, int n2, int n3, const double* rho,
                  int K, const int* offs, const double* wts,
                  int* labels, int max_attr) {
    return yt_sweep(n1, n2, n3, rho, K, offs, wts, labels, max_attr,
                    nullptr, nullptr);
}

int c2n_yt_charges(int n1, int n2, int n3, const double* rho,
                   int K, const int* offs, const double* wts,
                   int* labels, int max_attr,
                   const double* field, double* charges) {
    return yt_sweep(n1, n2, n3, rho, K, offs, wts, labels, max_attr,
                    field, charges);
}

// ---------------------------------------------------------------------
// Tricubic (Catmull-Rom tensor product) batch evaluation with value,
// gradient and Hessian -- the CPU-measured counterpart of the device
// kernel ops/interp.interp_soa and the independent verifier for CP
// positions (reference workload: grinterp_tricubic,
// src/grid3mod@proc.f90:1978-2143; BENCHMARK keyword apparatus,
// src/fieldmod@proc.f90:1734-1830). Identical basis and derivative
// conventions (d/dfrac scaled by n; Hessian in SYM6 order scaled by
// n_i*n_j). OpenMP over points when compiled with -fopenmp.
// ---------------------------------------------------------------------
static inline void cr_w(double t, double* w, double* dw, double* sw) {
    const double t2 = t * t, t3 = t2 * t;
    w[0] = 0.5 * (-t3 + 2.0 * t2 - t);
    w[1] = 0.5 * (3.0 * t3 - 5.0 * t2 + 2.0);
    w[2] = 0.5 * (-3.0 * t3 + 4.0 * t2 + t);
    w[3] = 0.5 * (t3 - t2);
    dw[0] = 0.5 * (-3.0 * t2 + 4.0 * t - 1.0);
    dw[1] = 0.5 * (9.0 * t2 - 10.0 * t);
    dw[2] = 0.5 * (-9.0 * t2 + 8.0 * t + 1.0);
    dw[3] = 0.5 * (3.0 * t2 - 2.0 * t);
    sw[0] = 0.5 * (-6.0 * t + 4.0);
    sw[1] = 0.5 * (18.0 * t - 10.0);
    sw[2] = 0.5 * (-18.0 * t + 8.0);
    sw[3] = 0.5 * (6.0 * t - 2.0);
}

void c2n_tricubic_batch(int n1, int n2, int n3, const double* f,
                        long long N, const double* xfrac,
                        double* y, double* grad, double* hess) {
    const int nn[3] = {n1, n2, n3};
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long long p = 0; p < N; ++p) {
        double w[3][4], dw[3][4], sw[3][4];
        int idx[3][4];
        for (int a = 0; a < 3; ++a) {
            double x = xfrac[3 * p + a];
            x -= std::floor(x);
            double xg = x * nn[a];
            int i0 = (int)std::floor(xg);
            if (i0 >= nn[a]) i0 = nn[a] - 1;
            double t = xg - i0;
            cr_w(t, w[a], dw[a], sw[a]);
            for (int s = 0; s < 4; ++s)
                idx[a][s] = ((i0 + s - 1) % nn[a] + nn[a]) % nn[a];
        }
        double v = 0, gx = 0, gy = 0, gz = 0;
        double hxx = 0, hyy = 0, hzz = 0, hxy = 0, hxz = 0, hyz = 0;
        for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j) {
                const double* base =
                    f + ((long long)idx[0][i] * n2 + idx[1][j]) * n3;
                double rz = 0, rdz = 0, rsz = 0;
                for (int k = 0; k < 4; ++k) {
                    const double g = base[idx[2][k]];
                    rz += w[2][k] * g;
                    rdz += dw[2][k] * g;
                    rsz += sw[2][k] * g;
                }
                const double wij = w[0][i] * w[1][j];
                v += wij * rz;
                gx += dw[0][i] * w[1][j] * rz;
                gy += w[0][i] * dw[1][j] * rz;
                gz += wij * rdz;
                hxx += sw[0][i] * w[1][j] * rz;
                hyy += w[0][i] * sw[1][j] * rz;
                hzz += wij * rsz;
                hxy += dw[0][i] * dw[1][j] * rz;
                hxz += dw[0][i] * w[1][j] * rdz;
                hyz += w[0][i] * dw[1][j] * rdz;
            }
        y[p] = v;
        grad[3 * p] = gx * n1;
        grad[3 * p + 1] = gy * n2;
        grad[3 * p + 2] = gz * n3;
        hess[6 * p] = hxx * (double)n1 * n1;
        hess[6 * p + 1] = hyy * (double)n2 * n2;
        hess[6 * p + 2] = hzz * (double)n3 * n3;
        hess[6 * p + 3] = hxy * (double)n1 * n2;
        hess[6 * p + 4] = hxz * (double)n1 * n3;
        hess[6 * p + 5] = hyz * (double)n2 * n3;
    }
}

// ---------------------------------------------------------------------
// Full NCI-driver stand-in (reference hot loop, src/nci@proc.f90:496-562):
// per grid node, tricubic value/grad/Hess, rotate derivatives to
// Cartesian (m_c2x sandwich), middle Hessian eigenvalue (closed-form
// trigonometric symmetric eig), RDG s = |grad|/(2 (3 pi^2)^(1/3)
// rho^(4/3)), and the dat-selection cutoff test.  Returns the number of
// nodes under the cutoffs (consumes every computed quantity, so nothing
// is dead code).  This is the honest single-core denominator for the
// device NCI leg: interp + eig + cutoffs, not interp alone.
// ---------------------------------------------------------------------
long long c2n_nci_sweep(int n1, int n2, int n3, const double* f,
                        const double* m_c2x, double rhocut,
                        double dimcut) {
    const double CONST = 2.0 * std::cbrt(3.0 * M_PI * M_PI);
    const int nn[3] = {n1, n2, n3};
    long long ndat = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) reduction(+ : ndat)
#endif
    for (long long p = 0; p < (long long)n1 * n2 * n3; ++p) {
        const int i = (int)(p / ((long long)n2 * n3));
        const int j = (int)((p / n3) % n2);
        const int k = (int)(p % n3);
        const int ig[3] = {i, j, k};
        double w[3][4], dw[3][4], sw[3][4];
        int idx[3][4];
        for (int a = 0; a < 3; ++a) {
            // node-centered box grid: x = i/n (exact grid nodes)
            int i0 = ig[a];
            double t = 0.0;
            cr_w(t, w[a], dw[a], sw[a]);
            for (int s = 0; s < 4; ++s)
                idx[a][s] = ((i0 + s - 1) % nn[a] + nn[a]) % nn[a];
        }
        double v = 0, gx = 0, gy = 0, gz = 0;
        double hxx = 0, hyy = 0, hzz = 0, hxy = 0, hxz = 0, hyz = 0;
        for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b) {
                const double* base =
                    f + ((long long)idx[0][a] * n2 + idx[1][b]) * n3;
                double rz = 0, rdz = 0, rsz = 0;
                for (int c = 0; c < 4; ++c) {
                    const double g = base[idx[2][c]];
                    rz += w[2][c] * g;
                    rdz += dw[2][c] * g;
                    rsz += sw[2][c] * g;
                }
                const double wab = w[0][a] * w[1][b];
                v += wab * rz;
                gx += dw[0][a] * w[1][b] * rz;
                gy += w[0][a] * dw[1][b] * rz;
                gz += wab * rdz;
                hxx += sw[0][a] * w[1][b] * rz;
                hyy += w[0][a] * sw[1][b] * rz;
                hzz += wab * rsz;
                hxy += dw[0][a] * dw[1][b] * rz;
                hxz += dw[0][a] * w[1][b] * rdz;
                hyz += w[0][a] * dw[1][b] * rdz;
            }
        // fractional -> Cartesian: g_c = m_c2x^T g_f (n-scaled),
        // H_c = m_c2x^T H_f m_c2x
        double gf[3] = {gx * n1, gy * n2, gz * n3};
        double Hf[3][3] = {
            {hxx * (double)n1 * n1, hxy * (double)n1 * n2,
             hxz * (double)n1 * n3},
            {hxy * (double)n1 * n2, hyy * (double)n2 * n2,
             hyz * (double)n2 * n3},
            {hxz * (double)n1 * n3, hyz * (double)n2 * n3,
             hzz * (double)n3 * n3}};
        double gc[3] = {0, 0, 0};
        for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 3; ++b)
                gc[a] += m_c2x[3 * b + a] * gf[b];
        double T[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
        for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 3; ++b)
                for (int cc = 0; cc < 3; ++cc)
                    T[a][b] += m_c2x[3 * cc + a] * Hf[cc][b];
        double Hc[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
        for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 3; ++b)
                for (int cc = 0; cc < 3; ++cc)
                    Hc[a][b] += T[a][cc] * m_c2x[3 * cc + b];
        // middle eigenvalue, trigonometric closed form
        const double q = (Hc[0][0] + Hc[1][1] + Hc[2][2]) / 3.0;
        const double da = Hc[0][0] - q, db = Hc[1][1] - q,
                     dc = Hc[2][2] - q;
        const double p2 = da * da + db * db + dc * dc
            + 2.0 * (Hc[0][1] * Hc[0][1] + Hc[0][2] * Hc[0][2]
                     + Hc[1][2] * Hc[1][2]);
        const double pp = std::sqrt(p2 / 6.0);
        double lam2 = q;
        if (pp > 0) {
            const double sp = pp;
            const double na = da / sp, nb = db / sp, nc = dc / sp;
            const double nxy = Hc[0][1] / sp, nxz = Hc[0][2] / sp,
                         nyz = Hc[1][2] / sp;
            double r = (na * (nb * nc - nyz * nyz)
                        - nxy * (nxy * nc - nyz * nxz)
                        + nxz * (nxy * nyz - nb * nxz)) / 2.0;
            r = std::max(-1.0, std::min(1.0, r));
            const double phi = std::acos(r) / 3.0;
            const double e1 = q + 2.0 * pp * std::cos(phi);
            const double e3 =
                q + 2.0 * pp * std::cos(phi + 2.0 * M_PI / 3.0);
            lam2 = 3.0 * q - e1 - e3;
        }
        const double gmod =
            std::sqrt(gc[0] * gc[0] + gc[1] * gc[1] + gc[2] * gc[2]);
        const double rho = std::max(v, 1e-40);
        const double rdg = gmod / (CONST * std::pow(rho, 4.0 / 3.0));
        const double crho =
            (lam2 >= 0 ? 1.0 : -1.0) * std::fabs(v) * 100.0;
        if (std::fabs(crho) < rhocut * 100.0 && rdg < dimcut) ++ndat;
    }
    return ndat;
}

// ---------------------------------------------------------------------
// Single-point tricubic eval (value + frac-scaled gradient + SYM6
// Hessian) -- scalar core shared by the sequential driver stand-ins.
// ---------------------------------------------------------------------
static void tric_point(int n1, int n2, int n3, const double* f,
                       const double* xf, double* v, double* gfr,
                       double* h6) {
    const int nn[3] = {n1, n2, n3};
    double w[3][4], dw[3][4], sw[3][4];
    int idx[3][4];
    for (int a = 0; a < 3; ++a) {
        double x = xf[a];
        x -= std::floor(x);
        double xg = x * nn[a];
        int i0 = (int)std::floor(xg);
        if (i0 >= nn[a]) i0 = nn[a] - 1;
        double t = xg - i0;
        cr_w(t, w[a], dw[a], sw[a]);
        for (int s = 0; s < 4; ++s)
            idx[a][s] = ((i0 + s - 1) % nn[a] + nn[a]) % nn[a];
    }
    double vv = 0, gx = 0, gy = 0, gz = 0;
    double hxx = 0, hyy = 0, hzz = 0, hxy = 0, hxz = 0, hyz = 0;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) {
            const double* base =
                f + ((long long)idx[0][i] * n2 + idx[1][j]) * n3;
            double rz = 0, rdz = 0, rsz = 0;
            for (int k = 0; k < 4; ++k) {
                const double g = base[idx[2][k]];
                rz += w[2][k] * g;
                rdz += dw[2][k] * g;
                rsz += sw[2][k] * g;
            }
            const double wij = w[0][i] * w[1][j];
            vv += wij * rz;
            gx += dw[0][i] * w[1][j] * rz;
            gy += w[0][i] * dw[1][j] * rz;
            gz += wij * rdz;
            hxx += sw[0][i] * w[1][j] * rz;
            hyy += w[0][i] * sw[1][j] * rz;
            hzz += wij * rsz;
            hxy += dw[0][i] * dw[1][j] * rz;
            hxz += dw[0][i] * w[1][j] * rdz;
            hyz += w[0][i] * dw[1][j] * rdz;
        }
    *v = vv;
    gfr[0] = gx * n1;
    gfr[1] = gy * n2;
    gfr[2] = gz * n3;
    h6[0] = hxx * (double)n1 * n1;
    h6[1] = hyy * (double)n2 * n2;
    h6[2] = hzz * (double)n3 * n3;
    h6[3] = hxy * (double)n1 * n2;
    h6[4] = hxz * (double)n1 * n3;
    h6[5] = hyz * (double)n2 * n3;
}

// Value-only tricubic batch (the cubature stand-in's field read: the
// reference's grd(v, 0) path computes no derivatives, so the CPU
// denominator must not be charged for them).
void c2n_tricubic_values(int n1, int n2, int n3, const double* f,
                         long long N, const double* xfrac, double* y) {
    const int nn[3] = {n1, n2, n3};
    for (long long p = 0; p < N; ++p) {
        double w[3][4], dw[3][4], sw[3][4];
        int idx[3][4];
        for (int a = 0; a < 3; ++a) {
            double x = xfrac[3 * p + a];
            x -= std::floor(x);
            double xg = x * nn[a];
            int i0 = (int)std::floor(xg);
            if (i0 >= nn[a]) i0 = nn[a] - 1;
            double t = xg - i0;
            cr_w(t, w[a], dw[a], sw[a]);
            for (int s = 0; s < 4; ++s)
                idx[a][s] = ((i0 + s - 1) % nn[a] + nn[a]) % nn[a];
        }
        double v = 0;
        for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j) {
                const double* base =
                    f + ((long long)idx[0][i] * n2 + idx[1][j]) * n3;
                double rz = 0;
                for (int k = 0; k < 4; ++k)
                    rz += w[2][k] * base[idx[2][k]];
                v += w[0][i] * w[1][j] * rz;
            }
        y[p] = v;
    }
}

// Cartesian gradient at a Cartesian point: frac = minv x (row-major
// minv), g_cart = minv^T g_frac.  Returns |g| and the unit ascent
// direction (sign sgn).
static double grad_dir(int n1, int n2, int n3, const double* f,
                       const double* minv, const double* xc, double sgn,
                       double* dir) {
    double xf[3] = {0, 0, 0};
    for (int a = 0; a < 3; ++a)
        for (int b = 0; b < 3; ++b)
            xf[a] += minv[3 * a + b] * xc[b];
    double v, gfr[3], h6[6];
    tric_point(n1, n2, n3, f, xf, &v, gfr, h6);
    double gc[3] = {0, 0, 0};
    for (int a = 0; a < 3; ++a)
        for (int b = 0; b < 3; ++b)
            gc[a] += minv[3 * b + a] * gfr[b];
    const double gm = std::sqrt(gc[0] * gc[0] + gc[1] * gc[1]
                                + gc[2] * gc[2]);
    const double inv = sgn / (gm + 1e-80);
    dir[0] = gc[0] * inv;
    dir[1] = gc[1] * inv;
    dir[2] = gc[2] * inv;
    return gm;
}

// ---------------------------------------------------------------------
// Sequential gradient-path color tracer: the single-core reference
// stand-in for the qtree/flux trace workload (one path at a time, as
// the reference's per-thread adaptive_stepper runs it,
// src/fieldmod@proc.f90:2076-2399 with the BS23 default pair,
// src/global@proc.f90:104-107).  Exactly the device tracer's
// semantics (ops/ode.py): FSAL BS23, capture at dist <= max(rt[k],
// |h|/2), gradient-zero -> status 1, step collapse -> 2, mstep -> 4.
// colors[i] = tgt_ids[k] on capture; gradient-zero finishers fall back
// to the nearest target within 0.5 bohr (the qtree driver's own
// saddle/nucleus classification), else -1.
// Returns the total number of field evaluations performed.
// ---------------------------------------------------------------------
long long c2n_trace_colors(int n1, int n2, int n3, const double* f,
                           const double* minv, long long N,
                           const double* seeds_cart, int K,
                           const double* tgt_cart, const int* tgt_ids,
                           const double* rt, double hini, double maxerr,
                           double gradeps, int mstep, int* colors) {
    long long nev = 0;
    for (long long p = 0; p < N; ++p) {
        double x[3] = {seeds_cart[3 * p], seeds_cart[3 * p + 1],
                       seeds_cart[3 * p + 2]};
        double h = hini;
        double d1[3];
        double gm = grad_dir(n1, n2, n3, f, minv, x, 1.0, d1);
        ++nev;
        int col = -1;
        int status = 4;
        for (int it = 0; it < mstep; ++it) {
            if (gm < gradeps) { status = 1; break; }
            // nearest-target capture
            int kb = -1;
            double db = 1e300;
            for (int k = 0; k < K; ++k) {
                const double dx = x[0] - tgt_cart[3 * k];
                const double dy = x[1] - tgt_cart[3 * k + 1];
                const double dz = x[2] - tgt_cart[3 * k + 2];
                const double d2 = dx * dx + dy * dy + dz * dz;
                if (d2 < db) { db = d2; kb = k; }
            }
            db = std::sqrt(db);
            if (kb >= 0 && db <= std::max(rt[kb], 0.5 * std::fabs(h))) {
                col = tgt_ids[kb];
                status = 0;
                break;
            }
            // BS23 attempt (FSAL: d1 is the direction at x)
            double x2[3], x3[3], xn[3], d2v[3], d3v[3], d4v[3];
            for (int a = 0; a < 3; ++a) x2[a] = x[a] + 0.5 * h * d1[a];
            grad_dir(n1, n2, n3, f, minv, x2, 1.0, d2v);
            for (int a = 0; a < 3; ++a) x3[a] = x[a] + 0.75 * h * d2v[a];
            grad_dir(n1, n2, n3, f, minv, x3, 1.0, d3v);
            for (int a = 0; a < 3; ++a)
                xn[a] = x[a] + h * (2.0 / 9.0 * d1[a] + 1.0 / 3.0 * d2v[a]
                                    + 4.0 / 9.0 * d3v[a]);
            const double gm4 = grad_dir(n1, n2, n3, f, minv, xn, 1.0, d4v);
            nev += 3;
            double nerr = 0;
            for (int a = 0; a < 3; ++a) {
                const double e = h * (-5.0 / 72.0 * d1[a]
                                      + 1.0 / 12.0 * d2v[a]
                                      + 1.0 / 9.0 * d3v[a]
                                      - 1.0 / 8.0 * d4v[a]);
                nerr += e * e;
            }
            nerr = std::sqrt(nerr);
            if (nerr < maxerr) {
                for (int a = 0; a < 3; ++a) { x[a] = xn[a]; d1[a] = d4v[a]; }
                gm = gm4;
                if (nerr < maxerr / 10.0)
                    h = std::min(std::fabs(1.6 * h), hini);
            } else {
                h = 0.9 * h * maxerr / std::max(nerr, 1e-30);
            }
            if (std::fabs(h) < 1e-12) { status = 2; break; }
        }
        if (status == 1) {
            // gradient-zero finisher: nearest target within 0.5 bohr
            int kb = -1;
            double db = 1e300;
            for (int k = 0; k < K; ++k) {
                const double dx = x[0] - tgt_cart[3 * k];
                const double dy = x[1] - tgt_cart[3 * k + 1];
                const double dz = x[2] - tgt_cart[3 * k + 2];
                const double d2 = dx * dx + dy * dy + dz * dz;
                if (d2 < db) { db = d2; kb = k; }
            }
            if (kb >= 0 && std::sqrt(db) < 0.5) col = tgt_ids[kb];
        }
        colors[p] = col;
    }
    return nev;
}

// ---------------------------------------------------------------------
// Sequential full AUTO driver stand-in: per-seed Newton search + CP-
// list dedup + rank/signature classification, one seed at a time (the
// reference's per-thread loop, src/autocp@proc.f90:694-723; newton
// src/fieldmod@proc.f90:1832-1868; addcp dedup/classify :1876).
// seeds_frac: (N,3) fractional.  m: row-major x2c (cart = m @ frac).
// Outputs: cps_frac (maxcp x 3), cp_sig (maxcp, signature -3..3).
// Returns number of unique CPs found (<= maxcp).
// ---------------------------------------------------------------------
int c2n_auto_drain(int n1, int n2, int n3, const double* f,
                   const double* m, long long N, const double* seeds_frac,
                   double gfnormeps, double cpeps, int maxit,
                   double* cps_frac, int* cp_sig, int maxcp) {
    // minv = m^{-1} for cart->frac of gradients
    double minv[9];
    {
        const double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4],
                     g = m[5], h = m[6], i = m[7], j = m[8];
        const double det = a * (e * j - g * i) - b * (d * j - g * h)
            + c * (d * i - e * h);
        const double id = 1.0 / det;
        minv[0] = (e * j - g * i) * id;
        minv[1] = (c * i - b * j) * id;
        minv[2] = (b * g - c * e) * id;
        minv[3] = (g * h - d * j) * id;
        minv[4] = (a * j - c * h) * id;
        minv[5] = (c * d - a * g) * id;
        minv[6] = (d * i - e * h) * id;
        minv[7] = (b * h - a * i) * id;
        minv[8] = (a * e - b * d) * id;
    }
    int ncp = 0;
    for (long long p = 0; p < N; ++p) {
        double xf[3] = {seeds_frac[3 * p], seeds_frac[3 * p + 1],
                        seeds_frac[3 * p + 2]};
        bool conv = false;
        double Hc[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
        for (int it = 0; it < maxit; ++it) {
            double v, gfr[3], h6[6];
            double xw[3] = {xf[0] - std::floor(xf[0]),
                            xf[1] - std::floor(xf[1]),
                            xf[2] - std::floor(xf[2])};
            tric_point(n1, n2, n3, f, xw, &v, gfr, h6);
            // Cartesian gradient / Hessian
            double gc[3] = {0, 0, 0};
            for (int a = 0; a < 3; ++a)
                for (int b = 0; b < 3; ++b)
                    gc[a] += minv[3 * b + a] * gfr[b];
            double Hf[3][3] = {{h6[0], h6[3], h6[4]},
                               {h6[3], h6[1], h6[5]},
                               {h6[4], h6[5], h6[2]}};
            double T[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
            for (int a = 0; a < 3; ++a)
                for (int b = 0; b < 3; ++b)
                    for (int cc = 0; cc < 3; ++cc)
                        T[a][b] += minv[3 * cc + a] * Hf[cc][b];
            for (int a = 0; a < 3; ++a)
                for (int b = 0; b < 3; ++b) {
                    Hc[a][b] = 0;
                    for (int cc = 0; cc < 3; ++cc)
                        Hc[a][b] += T[a][cc] * minv[3 * cc + b];
                }
            const double gn = std::sqrt(gc[0] * gc[0] + gc[1] * gc[1]
                                        + gc[2] * gc[2]);
            if (gn < gfnormeps) { conv = true; break; }
            // solve Hc dx = gc (Cramer)
            const double det =
                Hc[0][0] * (Hc[1][1] * Hc[2][2] - Hc[1][2] * Hc[2][1])
                - Hc[0][1] * (Hc[1][0] * Hc[2][2] - Hc[1][2] * Hc[2][0])
                + Hc[0][2] * (Hc[1][0] * Hc[2][1] - Hc[1][1] * Hc[2][0]);
            if (std::fabs(det) < 1e-30) break;
            double dx[3];
            for (int a = 0; a < 3; ++a) {
                double A[3][3];
                std::memcpy(A, Hc, sizeof(A));
                A[0][a] = gc[0];
                A[1][a] = gc[1];
                A[2][a] = gc[2];
                dx[a] = (A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1])
                         - A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0])
                         + A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]))
                        / det;
            }
            // step in Cartesian, back to frac
            double dxf[3] = {0, 0, 0};
            for (int a = 0; a < 3; ++a)
                for (int b = 0; b < 3; ++b)
                    dxf[a] += minv[3 * a + b] * dx[b];
            xf[0] -= dxf[0];
            xf[1] -= dxf[1];
            xf[2] -= dxf[2];
        }
        if (!conv) continue;
        for (int a = 0; a < 3; ++a) xf[a] -= std::floor(xf[a]);
        // dedup: min-image Cartesian distance against the found list
        bool dup = false;
        for (int q = 0; q < ncp && !dup; ++q) {
            double dfr[3];
            for (int a = 0; a < 3; ++a) {
                dfr[a] = xf[a] - cps_frac[3 * q + a];
                dfr[a] -= std::round(dfr[a]);
            }
            for (int s1 = -1; s1 <= 1 && !dup; ++s1)
                for (int s2 = -1; s2 <= 1 && !dup; ++s2)
                    for (int s3 = -1; s3 <= 1 && !dup; ++s3) {
                        const double df[3] = {dfr[0] + s1, dfr[1] + s2,
                                              dfr[2] + s3};
                        double dc[3] = {0, 0, 0};
                        for (int a = 0; a < 3; ++a)
                            for (int b = 0; b < 3; ++b)
                                dc[a] += m[3 * a + b] * df[b];
                        if (dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
                            < cpeps * cpeps)
                            dup = true;
                    }
        }
        if (dup || ncp >= maxcp) continue;
        // classify: signature of the (converged) Cartesian Hessian via
        // the trigonometric closed-form eigenvalues
        const double q0 = (Hc[0][0] + Hc[1][1] + Hc[2][2]) / 3.0;
        const double da = Hc[0][0] - q0, db_ = Hc[1][1] - q0,
                     dc_ = Hc[2][2] - q0;
        const double p2 = da * da + db_ * db_ + dc_ * dc_
            + 2.0 * (Hc[0][1] * Hc[0][1] + Hc[0][2] * Hc[0][2]
                     + Hc[1][2] * Hc[1][2]);
        const double pp = std::sqrt(p2 / 6.0);
        double e1 = q0, e2 = q0, e3 = q0;
        if (pp > 0) {
            const double na = da / pp, nb = db_ / pp, nc = dc_ / pp;
            const double nxy = Hc[0][1] / pp, nxz = Hc[0][2] / pp,
                         nyz = Hc[1][2] / pp;
            double r = (na * (nb * nc - nyz * nyz)
                        - nxy * (nxy * nc - nyz * nxz)
                        + nxz * (nxy * nyz - nb * nxz)) / 2.0;
            r = std::max(-1.0, std::min(1.0, r));
            const double phi = std::acos(r) / 3.0;
            e1 = q0 + 2.0 * pp * std::cos(phi);
            e3 = q0 + 2.0 * pp * std::cos(phi + 2.0 * M_PI / 3.0);
            e2 = 3.0 * q0 - e1 - e3;
        }
        int sig = 0;
        sig += (e1 > 0) ? 1 : -1;
        sig += (e2 > 0) ? 1 : -1;
        sig += (e3 > 0) ? 1 : -1;
        cps_frac[3 * ncp] = xf[0];
        cps_frac[3 * ncp + 1] = xf[1];
        cps_frac[3 * ncp + 2] = xf[2];
        cp_sig[ncp] = sig;
        ++ncp;
    }
    return ncp;
}

// ---------------------------------------------------------------------
// screened sequential GTO evaluation (the cps_large CPU denominator).
// Mirrors the reference per-point near-primitive evaluation
// (src/wfn_private@proc.F90:2032-2228): for each point, primitives with
// alpha*r^2 > lncut are skipped (the reference's dran screening ball,
// src/wfn_private@proc.F90:3075-3145), the surviving chi components are
// contracted against the MO coefficients one primitive at a time
// (axpy over the M occupied MOs - the cache-friendly layout given
// CT = C^T (P, M) row-major), then rho/grad/Hess assemble as in rho2.
//
// ctr (P,3) primitive centers, li (P,3) Cartesian powers, alpha (P),
// CT (P,M) transposed MO coefficients, occ (M), pts (npts,3) Cartesian.
// nder: 0 (rho), 1 (+grad), 2 (+hess). Returns the total number of
// SURVIVING primitive visits (the work measure).
// ---------------------------------------------------------------------
static inline double powi(double v, int k) {
    if (k < 0) return 0.0;            // always multiplied by a 0 coeff
    double out = 1.0;
    for (int i = 0; i < k; ++i) out *= v;
    return out;
}

long long c2n_wfn_eval(long long P, const double* ctr, const int* li,
                       const double* alpha, int M, const double* CT,
                       const double* occ, long long npts,
                       const double* pts, int nder, double lncut,
                       double* rho, double* grad, double* hess) {
    const int ncomp = (nder == 0) ? 1 : (nder == 1 ? 4 : 10);
    std::vector<double> phi((size_t)ncomp * M);
    long long nvisit = 0;
    for (long long ip = 0; ip < npts; ++ip) {
        const double x = pts[3 * ip], y = pts[3 * ip + 1],
                     z = pts[3 * ip + 2];
        std::fill(phi.begin(), phi.end(), 0.0);
        for (long long p = 0; p < P; ++p) {
            const double dx = x - ctr[3 * p], dy = y - ctr[3 * p + 1],
                         dz = z - ctr[3 * p + 2];
            const double r2 = dx * dx + dy * dy + dz * dz;
            const double al = alpha[p];
            if (al * r2 > lncut) continue;    // screened out
            ++nvisit;
            const int a = li[3 * p], b = li[3 * p + 1], c = li[3 * p + 2];
            const double ex = std::exp(-al * r2);
            const double xa = powi(dx, a), yb = powi(dy, b),
                         zc = powi(dz, c);
            double comp[10];
            comp[0] = xa * yb * zc * ex;
            int nc = 1;
            double dxa = 0, dyb = 0, dzc = 0;
            if (nder >= 1) {
                dxa = a * powi(dx, a - 1) - 2.0 * al * powi(dx, a + 1);
                dyb = b * powi(dy, b - 1) - 2.0 * al * powi(dy, b + 1);
                dzc = c * powi(dz, c - 1) - 2.0 * al * powi(dz, c + 1);
                comp[1] = dxa * yb * zc * ex;
                comp[2] = xa * dyb * zc * ex;
                comp[3] = xa * yb * dzc * ex;
                nc = 4;
            }
            if (nder >= 2) {
                const double sxa = a * (a - 1) * powi(dx, a - 2)
                    - 2.0 * al * (2 * a + 1) * xa
                    + 4.0 * al * al * powi(dx, a + 2);
                const double syb = b * (b - 1) * powi(dy, b - 2)
                    - 2.0 * al * (2 * b + 1) * yb
                    + 4.0 * al * al * powi(dy, b + 2);
                const double szc = c * (c - 1) * powi(dz, c - 2)
                    - 2.0 * al * (2 * c + 1) * zc
                    + 4.0 * al * al * powi(dz, c + 2);
                comp[4] = sxa * yb * zc * ex;
                comp[5] = xa * syb * zc * ex;
                comp[6] = xa * yb * szc * ex;
                comp[7] = dxa * dyb * zc * ex;
                comp[8] = dxa * yb * dzc * ex;
                comp[9] = xa * dyb * dzc * ex;
                nc = 10;
            }
            const double* crow = CT + (size_t)p * M;
            for (int k = 0; k < nc; ++k) {
                const double ck = comp[k];
                if (ck == 0.0) continue;
                double* ph = phi.data() + (size_t)k * M;
                for (int mj = 0; mj < M; ++mj) ph[mj] += ck * crow[mj];
            }
        }
        const double* f0 = phi.data();
        double r = 0.0;
        for (int mj = 0; mj < M; ++mj) r += occ[mj] * f0[mj] * f0[mj];
        rho[ip] = r;
        if (nder >= 1 && grad) {
            for (int d = 0; d < 3; ++d) {
                const double* fd = phi.data() + (size_t)(1 + d) * M;
                double gv = 0.0;
                for (int mj = 0; mj < M; ++mj)
                    gv += occ[mj] * f0[mj] * fd[mj];
                grad[3 * ip + d] = 2.0 * gv;
            }
        }
        if (nder >= 2 && hess) {
            const double* px = phi.data() + (size_t)1 * M;
            const double* py = phi.data() + (size_t)2 * M;
            const double* pz = phi.data() + (size_t)3 * M;
            const double* comp2[6] = {
                phi.data() + (size_t)4 * M, phi.data() + (size_t)5 * M,
                phi.data() + (size_t)6 * M, phi.data() + (size_t)7 * M,
                phi.data() + (size_t)8 * M, phi.data() + (size_t)9 * M};
            const double* d1a[6] = {px, py, pz, px, px, py};
            const double* d1b[6] = {px, py, pz, py, pz, pz};
            double hv[6];
            for (int k = 0; k < 6; ++k) {
                double s = 0.0;
                const double* sk = comp2[k];
                const double* ga = d1a[k];
                const double* gb = d1b[k];
                for (int mj = 0; mj < M; ++mj)
                    s += occ[mj] * (f0[mj] * sk[mj] + ga[mj] * gb[mj]);
                hv[k] = 2.0 * s;
            }
            double* H = hess + 9 * ip;
            H[0] = hv[0]; H[4] = hv[1]; H[8] = hv[2];
            H[1] = H[3] = hv[3];
            H[2] = H[6] = hv[4];
            H[5] = H[7] = hv[5];
        }
    }
    return nvisit;
}

// ---------------------------------------------------------------------
// sequential AUTO drain on a molecular GTO field: per-seed Newton on
// the screened evaluator above, plain-distance dedup, signature
// classification (the reference per-seed loop src/autocp@proc.f90:
// 694-723 with the wfn rho2 evaluator; single core, Cartesian - no
// PBC for molecules). Seeds and CPs are Cartesian. Returns ncp;
// *nev_out counts Newton evaluations (points, not primitives).
// ---------------------------------------------------------------------
int c2n_wfn_auto_drain(long long P, const double* ctr, const int* li,
                       const double* alpha, int M, const double* CT,
                       const double* occ, long long nseeds,
                       const double* seeds, double gfnormeps,
                       double cpeps, int maxit, double lncut,
                       double rmax, double* cps, int* cp_sig,
                       int maxcp, long long* nev_out) {
    int ncp = 0;
    long long nev = 0;
    for (long long s = 0; s < nseeds; ++s) {
        double xx[3] = {seeds[3 * s], seeds[3 * s + 1], seeds[3 * s + 2]};
        bool conv = false;
        double Hc[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
        for (int it = 0; it < maxit; ++it) {
            double r, g[3];
            c2n_wfn_eval(P, ctr, li, alpha, M, CT, occ, 1, xx, 2,
                         lncut, &r, g, Hc);
            ++nev;
            const double gn = std::sqrt(g[0] * g[0] + g[1] * g[1]
                                        + g[2] * g[2]);
            if (gn < gfnormeps) { conv = true; break; }
            // solve Hc dx = g (Cramer)
            const double det =
                Hc[0] * (Hc[4] * Hc[8] - Hc[5] * Hc[7])
                - Hc[1] * (Hc[3] * Hc[8] - Hc[5] * Hc[6])
                + Hc[2] * (Hc[3] * Hc[7] - Hc[4] * Hc[6]);
            if (std::fabs(det) < 1e-30) break;
            double dx[3];
            for (int a = 0; a < 3; ++a) {
                double A[9];
                std::memcpy(A, Hc, sizeof(A));
                A[a] = g[0];
                A[3 + a] = g[1];
                A[6 + a] = g[2];
                dx[a] = (A[0] * (A[4] * A[8] - A[5] * A[7])
                         - A[1] * (A[3] * A[8] - A[5] * A[6])
                         + A[2] * (A[3] * A[7] - A[4] * A[6])) / det;
            }
            xx[0] -= dx[0];
            xx[1] -= dx[1];
            xx[2] -= dx[2];
            if (xx[0] * xx[0] + xx[1] * xx[1] + xx[2] * xx[2]
                > rmax * rmax)
                break;                 // escaped the molecule
        }
        if (!conv) continue;
        bool dup = false;
        for (int q = 0; q < ncp && !dup; ++q) {
            const double d0 = xx[0] - cps[3 * q],
                         d1 = xx[1] - cps[3 * q + 1],
                         d2 = xx[2] - cps[3 * q + 2];
            if (d0 * d0 + d1 * d1 + d2 * d2 < cpeps * cpeps) dup = true;
        }
        if (dup || ncp >= maxcp) continue;
        // signature via the trigonometric closed-form eigenvalues
        const double q0 = (Hc[0] + Hc[4] + Hc[8]) / 3.0;
        const double da = Hc[0] - q0, db_ = Hc[4] - q0, dc_ = Hc[8] - q0;
        const double p2 = da * da + db_ * db_ + dc_ * dc_
            + 2.0 * (Hc[1] * Hc[1] + Hc[2] * Hc[2] + Hc[5] * Hc[5]);
        const double pp = std::sqrt(p2 / 6.0);
        double e1 = q0, e2 = q0, e3 = q0;
        if (pp > 0) {
            const double na = da / pp, nb = db_ / pp, nc_ = dc_ / pp;
            const double nxy = Hc[1] / pp, nxz = Hc[2] / pp,
                         nyz = Hc[5] / pp;
            double rr = (na * (nb * nc_ - nyz * nyz)
                         - nxy * (nxy * nc_ - nyz * nxz)
                         + nxz * (nxy * nyz - nb * nxz)) / 2.0;
            rr = std::max(-1.0, std::min(1.0, rr));
            const double phi = std::acos(rr) / 3.0;
            e1 = q0 + 2.0 * pp * std::cos(phi);
            e3 = q0 + 2.0 * pp * std::cos(phi + 2.0 * M_PI / 3.0);
            e2 = 3.0 * q0 - e1 - e3;
        }
        int sig = 0;
        sig += (e1 > 0) ? 1 : -1;
        sig += (e2 > 0) ? 1 : -1;
        sig += (e3 > 0) ? 1 : -1;
        cps[3 * ncp] = xx[0];
        cps[3 * ncp + 1] = xx[1];
        cps[3 * ncp + 2] = xx[2];
        cp_sig[ncp] = sig;
        ++ncp;
    }
    if (nev_out) *nev_out = nev;
    return ncp;
}

int c2n_omp_threads() {
#ifdef _OPENMP
    int n = 0;
#pragma omp parallel
    {
#pragma omp single
        n = omp_get_num_threads();
    }
    return n;
#else
    return 1;
#endif
}

}  // extern "C"
