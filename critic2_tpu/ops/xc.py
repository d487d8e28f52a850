"""Exchange-correlation functional kernels (libxc replacement subset).

Role of the reference's optional libxc hookup (src/arithmetic@proc.F90
fun_xc, :1609-1646): evaluate XC energy densities e(r) = rho*eps(r) in
expressions `xc(rho[, grad][, lap, tau], id)`. The reference's tested set
(tests_libxc/ref.txt) fixes the scope: LDA (Slater + VWN-RPA), PBE, BLYP,
BP86, TPSS. Functional ids follow libxc numbering.

All formulas are the published closed-shell (unpolarized) forms, written
as fused elementwise JAX - pure VPU work. grad is |grad rho| (the
critic2 expression convention), not sigma.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["xc_eval", "XC_IDS"]

XC_IDS = {
    1: "lda_x", 7: "lda_c_vwn", 8: "lda_c_vwn_rpa", 9: "lda_c_pz",
    12: "lda_c_pw",
    101: "gga_x_pbe", 102: "gga_x_pbe_r", 116: "gga_x_pbe_sol",
    117: "gga_x_rpbe", 130: "gga_c_pbe", 133: "gga_c_pbe_sol",
    106: "gga_x_b88", 131: "gga_c_lyp", 132: "gga_c_p86",
    109: "gga_x_pw91", 134: "gga_c_pw91", 118: "gga_x_wc",
    108: "gga_x_pw86", 139: "gga_x_optb88_vdw", 141: "gga_x_optpbe_vdw",
    107: "gga_x_g96", 120: "gga_x_am05", 135: "gga_c_am05",
    202: "mgga_x_tpss", 231: "mgga_c_tpss",
    263: "mgga_x_scan", 267: "mgga_c_scan",
    # hybrids: the SEMILOCAL energy density (the exact-exchange
    # fraction is SCF metadata - libxc's energy-density output has no
    # HF contribution either, so the reference's xc() forwards exactly
    # this for hybrid ids, src/arithmetic@proc.F90:1609-1646)
    401: "hyb_gga_xc_b3pw91", 402: "hyb_gga_xc_b3lyp",
    406: "hyb_gga_xc_pbeh", 475: "hyb_gga_xc_b3lyp5",
}

_TINY = 1e-30


def _safe(rho):
    return jnp.maximum(rho, _TINY)


# ---------------------------------------------------------------------------
# LDA
# ---------------------------------------------------------------------------
def lda_x(rho):
    cx = (3.0 / 4.0) * (3.0 / jnp.pi) ** (1.0 / 3.0)
    return -cx * _safe(rho) ** (4.0 / 3.0)


def _vwn_eps(rs, A, x0, b, c):
    x = jnp.sqrt(rs)
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = jnp.sqrt(4.0 * c - b * b)
    at = jnp.arctan(Q / (2.0 * x + b))
    return A * (jnp.log(x * x / X) + 2.0 * b / Q * at
                - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X)
                                 + 2.0 * (b + 2.0 * x0) / Q * at))


def lda_c_vwn(rho):
    """VWN5 parametrization (libxc LDA_C_VWN), paramagnetic."""
    rs = (3.0 / (4.0 * jnp.pi * _safe(rho))) ** (1.0 / 3.0)
    return rho * _vwn_eps(rs, 0.0310907, -0.10498, 3.72744, 12.9352)


def lda_c_vwn_rpa(rho):
    """VWN RPA parametrization (libxc LDA_C_VWN_RPA; Gaussian's SVWN)."""
    rs = (3.0 / (4.0 * jnp.pi * _safe(rho))) ** (1.0 / 3.0)
    return rho * _vwn_eps(rs, 0.0310907, -0.409286, 13.0720, 42.7198)


def _pw92_G(rs, A, a1, b1, b2, b3, b4):
    srs = jnp.sqrt(rs)
    den = 2.0 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
    return -2.0 * A * (1.0 + a1 * rs) * jnp.log(1.0 + 1.0 / den)


def _pw92_eps(rs):
    """PW92 unpolarized correlation energy per particle."""
    return _pw92_G(rs, 0.0310907, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)


def _pw92_eps_zeta1(rs):
    """PW92 fully spin-polarized (zeta = 1)."""
    return _pw92_G(rs, 0.01554535, 0.20548, 14.1189, 6.1977, 3.3662,
                   0.62517)


def lda_c_pw(rho):
    rs = (3.0 / (4.0 * jnp.pi * _safe(rho))) ** (1.0 / 3.0)
    return rho * _pw92_eps(rs)


# ---------------------------------------------------------------------------
# GGA exchange
# ---------------------------------------------------------------------------
def _s_red(rho, grad):
    kf = (3.0 * jnp.pi ** 2 * _safe(rho)) ** (1.0 / 3.0)
    return grad / (2.0 * kf * _safe(rho))


def gga_x_pbe(rho, grad):
    # mu as published in PRL 77, 3865 (and used by the libxc build
    # behind the reference's pinned values, tests_libxc/ref.txt:2 —
    # the high-precision beta-derived 0.2195149727645171 overshoots the
    # pinned integral by 1.5e-5 Ha on h2o)
    kappa, mu = 0.8040, 0.21951
    s = _s_red(rho, grad)
    fx = 1.0 + kappa - kappa / (1.0 + mu * s * s / kappa)
    return lda_x(rho) * fx


def _b88_family(rho, grad, beta, gamma):
    """Becke-88 functional form, closed shell (sum over spins):
    e_sigma = -rho_s^{4/3} (Cx + beta x^2 / (1 + gamma beta x asinh x)),
    x = |grad rho_s| / rho_s^{4/3} (libxc gga_x_b88.c parametrization;
    B88 has gamma = 6)."""
    rs2 = _safe(rho) / 2.0               # per-spin density
    gs2 = grad / 2.0
    x = gs2 / rs2 ** (4.0 / 3.0)
    cx = (3.0 / 2.0) * (3.0 / (4.0 * jnp.pi)) ** (1.0 / 3.0)
    e_sigma = -rs2 ** (4.0 / 3.0) * (
        cx + beta * x * x / (1.0 + gamma * beta * x * jnp.arcsinh(x)))
    return 2.0 * e_sigma


def gga_x_b88(rho, grad):
    """Becke 88 exchange, closed shell (sum over spins)."""
    return _b88_family(rho, grad, 0.0042, 6.0)


def gga_x_optb88_vdw(rho, grad):
    """optB88 exchange (Klimes-Bowler-Michaelides, libxc
    GGA_X_OPTB88_VDW, id 139): B88 form refit for vdW-DF pairing,
    beta = 0.00336865923905927, gamma = 6.98131700797731."""
    return _b88_family(rho, grad, 0.00336865923905927, 6.98131700797731)


def gga_x_pw86(rho, grad):
    """Perdew-Wang 86 exchange (libxc GGA_X_PW86, id 108):
    F = (1 + 1.296 s^2 + 14 s^4 + 0.2 s^6)^(1/15)."""
    s = _s_red(rho, grad)
    s2 = s * s
    fx = (1.0 + 1.296 * s2 + 14.0 * s2 * s2 + 0.2 * s2 ** 3) ** (1.0 / 15.0)
    return lda_x(rho) * fx


# ---------------------------------------------------------------------------
# GGA correlation
# ---------------------------------------------------------------------------
def _pbe_c_eps(rho, grad, zeta1: bool = False, beta: float = 0.066725):
    """PBE correlation energy per particle; zeta1 -> fully polarized.
    beta defaults to the PRL 77, 3865 published value (see gga_x_pbe);
    PBEsol passes 0.046."""
    gamma = (1.0 - jnp.log(2.0)) / jnp.pi ** 2
    rho = _safe(rho)
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    if zeta1:
        eps = _pw92_eps_zeta1(rs)
        phi = 2.0 ** (2.0 / 3.0) / 2.0       # ((1+1)^{2/3}+0)/2
    else:
        eps = _pw92_eps(rs)
        phi = 1.0
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    t = grad / (2.0 * phi * ks * rho)
    g3 = phi ** 3
    expo = jnp.exp(-eps / (gamma * g3))
    A = beta / gamma / jnp.maximum(expo - 1.0, _TINY)
    t2 = t * t
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = g3 * gamma * jnp.log(1.0 + beta / gamma * t2 * num / den)
    return eps + H


def gga_c_pbe(rho, grad):
    return _safe(rho) * _pbe_c_eps(rho, grad)


def gga_c_lyp(rho, grad):
    """LYP correlation (Miehlich form, closed shell)."""
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    rho = _safe(rho)
    sigma = grad * grad
    cf = 0.3 * (3.0 * jnp.pi ** 2) ** (2.0 / 3.0)
    r13 = rho ** (-1.0 / 3.0)
    denom = 1.0 + d * r13
    omega = jnp.exp(-c * r13) / denom * rho ** (-11.0 / 3.0)
    delta = c * r13 + d * r13 / denom
    ra = rb = rho / 2.0
    saa = sbb = sigma / 4.0
    stot = sigma
    term1 = -4.0 * a * ra * rb / (rho * denom)
    inner = (ra * rb * (2.0 ** (11.0 / 3.0) * cf
                        * (ra ** (8.0 / 3.0) + rb ** (8.0 / 3.0))
                        + (47.0 / 18.0 - 7.0 * delta / 18.0) * stot
                        - (5.0 / 2.0 - delta / 18.0) * (saa + sbb)
                        - (delta - 11.0) / 9.0
                        * (ra * saa + rb * sbb) / rho)
             + (-2.0 / 3.0 * rho * rho) * stot
             + (2.0 / 3.0 * rho * rho - ra * ra) * sbb
             + (2.0 / 3.0 * rho * rho - rb * rb) * saa)
    return term1 - a * b * omega * inner


def _pz81_eps(rs):
    """Perdew-Zunger 81 unpolarized local correlation."""
    lo = (0.0311 * jnp.log(jnp.maximum(rs, _TINY)) - 0.048
          + 0.0020 * rs * jnp.log(jnp.maximum(rs, _TINY)) - 0.0116 * rs)
    hi = -0.1423 / (1.0 + 1.0529 * jnp.sqrt(rs) + 0.3334 * rs)
    return jnp.where(rs < 1.0, lo, hi)


def lda_c_pz(rho):
    """Perdew-Zunger 81 local correlation (libxc LDA_C_PZ, id 9)."""
    rho = _safe(rho)
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    return rho * _pz81_eps(rs)


def _pbe_x_family(rho, grad, kappa, mu):
    s = _s_red(rho, grad)
    fx = 1.0 + kappa - kappa / (1.0 + mu * s * s / kappa)
    return lda_x(rho) * fx


def gga_x_pbe_r(rho, grad):
    """revPBE exchange (Zhang-Yang, libxc GGA_X_PBE_R, id 102):
    PBE form with kappa = 1.245."""
    return _pbe_x_family(rho, grad, 1.245, 0.2195149727645171)


def gga_x_pbe_sol(rho, grad):
    """PBEsol exchange (libxc GGA_X_PBE_SOL, id 116): mu = 10/81."""
    return _pbe_x_family(rho, grad, 0.8040, 10.0 / 81.0)


def gga_x_rpbe(rho, grad):
    """RPBE exchange (Hammer-Hansen-Norskov, libxc GGA_X_RPBE,
    id 117): F_x = 1 + kappa (1 - exp(-mu s^2 / kappa))."""
    kappa, mu = 0.8040, 0.2195149727645171
    s = _s_red(rho, grad)
    fx = 1.0 + kappa * (1.0 - jnp.exp(-mu * s * s / kappa))
    return lda_x(rho) * fx


def gga_c_pbe_sol(rho, grad):
    """PBEsol correlation (libxc GGA_C_PBE_SOL, id 133):
    PBE form with beta = 0.046."""
    return _safe(rho) * _pbe_c_eps(rho, grad, beta=0.046)


def gga_c_p86(rho, grad):
    """Perdew 86 correlation (PZ81 local + gradient term), closed shell."""
    rho = _safe(rho)
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    eps = _pz81_eps(rs)
    c1 = 0.001667
    c2, c3, c4 = 0.002568, 0.023266, 7.389e-6
    c5, c6, c7 = 8.723, 0.472, 7.389e-2
    Crho = c1 + (c2 + c3 * rs + c4 * rs * rs) / \
        (1.0 + c5 * rs + c6 * rs * rs + c7 * rs ** 3)
    Cinf = c1 + c2
    # d = 1 for unpolarized; 0.192 is the rounded 1.745*ftilde
    # (ftilde = 0.11) the reference's libxc build uses — the unrounded
    # product 0.19195 moves the pinned h2o BP86 integral by 8e-5 Ha
    # (tests_libxc/ref.txt:4)
    phi = 0.192 * Cinf / Crho * grad / rho ** (7.0 / 6.0)
    grad_term = jnp.exp(-phi) * Crho * grad * grad / rho ** (4.0 / 3.0)
    return rho * eps + grad_term


# ---------------------------------------------------------------------------
# meta-GGA (TPSS)
# ---------------------------------------------------------------------------
def mgga_x_tpss(rho, grad, lap, tau):
    """TPSS exchange (JCP 91, 146401 (2003)), closed shell."""
    rho = _safe(rho)
    kappa, mu = 0.804, 0.21951
    b, c, e = 0.40, 1.59096, 1.537
    s = _s_red(rho, grad)
    p = s * s
    tau_w = grad * grad / (8.0 * rho)                 # von Weizsaecker
    tau_unif = 0.3 * (3.0 * jnp.pi ** 2) ** (2.0 / 3.0) * rho ** (5.0 / 3.0)
    tau = jnp.maximum(tau, _TINY)
    # no clamping of z or alpha: inputs are taken literally, as libxc does
    # (the reference test feeds tau/2, driving z past 1)
    z = tau_w / tau
    alpha = (tau - tau_w) / tau_unif
    qb = 9.0 / 20.0 * (alpha - 1.0) / jnp.sqrt(
        1.0 + b * alpha * (alpha - 1.0)) + 2.0 * p / 3.0
    z2 = z * z
    x = ((10.0 / 81.0 + c * z2 / (1.0 + z2) ** 2) * p
         + 146.0 / 2025.0 * qb * qb
         - 73.0 / 405.0 * qb * jnp.sqrt(0.5 * (0.6 * z) ** 2 + 0.5 * p * p)
         + (10.0 / 81.0) ** 2 * p * p / kappa
         + 2.0 * jnp.sqrt(e) * 10.0 / 81.0 * (0.6 * z) ** 2
         + e * mu * p ** 3) / (1.0 + jnp.sqrt(e) * p) ** 2
    fx = 1.0 + kappa - kappa / (1.0 + x / kappa)
    return lda_x(rho) * fx


def mgga_c_tpss(rho, grad, lap, tau):
    """TPSS correlation (revPKZB on PBE, PRL 91 146401 eq. 11-14),
    closed shell: eps_rev = eps_PBE (1 + C z^2) - (1 + C) z^2 eps_tilde,
    eps_tilde = max(eps_PBE^{zeta=1}(rho/2, grad/2), eps_PBE(rho, grad));
    e_c = rho eps_rev [1 + d eps_rev z^3], C(0,0) = 0.53, d = 2.8."""
    rho = _safe(rho)
    d = 2.8
    tau_w = grad * grad / (8.0 * rho)
    tau = jnp.maximum(tau, _TINY)
    z = tau_w / tau
    eps_pbe = _pbe_c_eps(rho, grad)
    eps_pol = _pbe_c_eps(rho / 2.0, grad / 2.0, zeta1=True)
    eps_til = jnp.maximum(eps_pol, eps_pbe)
    C0 = 0.53
    z2 = z * z
    eps_rev = eps_pbe * (1.0 + C0 * z2) - (1.0 + C0) * z2 * eps_til
    return rho * eps_rev * (1.0 + d * eps_rev * z ** 3)


def gga_x_pw91(rho, grad):
    """PW91 exchange (Perdew-Wang 91, libxc GGA_X_PW91, id 109):
    F = (1 + a s asinh(b s) + (c - d e^{-100 s^2}) s^2)
        / (1 + a s asinh(b s) + e s^4)."""
    a, b, c, d, e = 0.19645, 7.7956, 0.2743, 0.1508, 0.004
    s = _s_red(rho, grad)
    s2 = s * s
    ash = a * s * jnp.arcsinh(b * s)
    fx = ((1.0 + ash + (c - d * jnp.exp(-100.0 * s2)) * s2)
          / (1.0 + ash + e * s2 * s2))
    return lda_x(rho) * fx


def gga_c_pw91(rho, grad):
    """PW91 correlation (libxc GGA_C_PW91, id 134), closed shell:
    eps = eps_PW92 + H0 + H1 with the Rasolt-Geldart Cc(rs)."""
    rho = _safe(rho)
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    eps = _pw92_eps(rs)
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    t = grad / (2.0 * ks * rho)
    s = _s_red(rho, grad)
    t2 = t * t
    alpha = 0.09
    cc0 = 0.004235
    cx = -0.001667
    nu = (16.0 / jnp.pi) * (3.0 * jnp.pi ** 2) ** (1.0 / 3.0)
    beta = nu * cc0
    A = (2.0 * alpha / beta
         / jnp.maximum(jnp.exp(2.0 * alpha * (-eps) / beta ** 2) - 1.0,
                       _TINY))
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H0 = (beta ** 2 / (2.0 * alpha)
          * jnp.log(1.0 + 2.0 * alpha / beta * t2 * num / den))
    # Rasolt-Geldart gradient coefficient (PW91 paper eq. 14)
    ccrs = -cx + (2.568e-3 + 2.3266e-2 * rs + 7.389e-6 * rs * rs) \
        / (1.0 + 8.723 * rs + 0.472 * rs * rs + 7.389e-2 * rs ** 3)
    H1 = (nu * (ccrs - cc0 - 3.0 * (-cx) / 7.0) * t2
          * jnp.exp(-100.0 * s * s))
    return rho * (eps + H0 + H1)


def gga_x_optpbe_vdw(rho, grad):
    """optPBE exchange (Klimes-Bowler-Michaelides, libxc
    GGA_X_OPTPBE_VDW, id 141): PBE form with kappa = 1.04804,
    mu = 0.175519."""
    return _pbe_x_family(rho, grad, 1.04804, 0.175519)


# ---------------------------------------------------------------------------
# hybrid composites (semilocal part; see XC_IDS note)
# ---------------------------------------------------------------------------
def hyb_gga_xc_b3lyp(rho, grad):
    """B3LYP semilocal part (libxc HYB_GGA_XC_B3LYP, id 402):
    0.08 LDA_X + 0.72 B88 + 0.19 VWN_RPA + 0.81 LYP
    (a0 = 0.20 exact exchange excluded - energy-density output)."""
    return (0.08 * lda_x(rho) + 0.72 * gga_x_b88(rho, grad)
            + 0.19 * lda_c_vwn_rpa(rho) + 0.81 * gga_c_lyp(rho, grad))


def hyb_gga_xc_b3lyp5(rho, grad):
    """B3LYP5 semilocal part (libxc HYB_GGA_XC_B3LYP5, id 475):
    B3LYP with the VWN5 local correlation instead of VWN_RPA."""
    return (0.08 * lda_x(rho) + 0.72 * gga_x_b88(rho, grad)
            + 0.19 * lda_c_vwn(rho) + 0.81 * gga_c_lyp(rho, grad))


def hyb_gga_xc_b3pw91(rho, grad):
    """B3PW91 semilocal part (Becke 93; libxc HYB_GGA_XC_B3PW91,
    id 401): 0.08 LDA_X + 0.72 B88 + 0.19 LDA_C_PW + 0.81 PW91c."""
    return (0.08 * lda_x(rho) + 0.72 * gga_x_b88(rho, grad)
            + 0.19 * lda_c_pw(rho) + 0.81 * gga_c_pw91(rho, grad))


def hyb_gga_xc_pbeh(rho, grad):
    """PBE0/PBEh semilocal part (libxc HYB_GGA_XC_PBEH, id 406):
    0.75 PBE_X + PBE_C (0.25 exact exchange excluded)."""
    return 0.75 * gga_x_pbe(rho, grad) + gga_c_pbe(rho, grad)


def gga_x_wc(rho, grad):
    """Wu-Cohen exchange (libxc GGA_X_WC, id 118): PBE form with
    x(s) = (10/81) s^2 + (mu - 10/81) s^2 e^{-s^2} + ln(1 + c s^4)."""
    kappa, mu, c = 0.8040, 0.2195149727645171, 0.0079325
    s = _s_red(rho, grad)
    s2 = s * s
    x = (10.0 / 81.0) * s2 + (mu - 10.0 / 81.0) * s2 * jnp.exp(-s2) \
        + jnp.log(1.0 + c * s2 * s2)
    fx = 1.0 + kappa - kappa / (1.0 + x / kappa)
    return lda_x(rho) * fx


def gga_x_g96(rho, grad):
    """Gill 96 exchange (libxc GGA_X_G96, id 107; Mol. Phys. 89, 433),
    closed shell: e_sigma = -rho_s^{4/3} (Cx + x^{3/2}/137),
    x = |grad rho_s| / rho_s^{4/3}."""
    rs2 = _safe(rho) / 2.0
    x = (grad / 2.0) / rs2 ** (4.0 / 3.0)
    cx = (3.0 / 2.0) * (3.0 / (4.0 * jnp.pi)) ** (1.0 / 3.0)
    return 2.0 * (-(rs2 ** (4.0 / 3.0)) * (cx + x ** 1.5 / 137.0))


def _lambertw0(x):
    """Lambert W_0 for x >= 0 (the AM05 Airy-gas closed form needs it).
    log1p seed + 4 Halley steps: <1e-14 relative on [0, 1e12]."""
    w = jnp.log1p(x)
    for _ in range(4):
        ew = jnp.exp(w)
        f = w * ew - x
        w = w - f / (ew * (w + 1.0) - (w + 2.0) * f / (2.0 * w + 2.0))
    return w


_AM05_ALPHA, _AM05_C, _AM05_GAMMA = 2.804, 0.7168, 0.8098
_AM05_D = 28.23705740248932


def gga_x_am05(rho, grad):
    """Armiento-Mattsson 05 exchange (libxc GGA_X_AM05, id 120; PRB 72,
    085108): LAA interpolation between LDA and the Airy-gas edge
    functional, F = X + (1-X) flaa, X = 1/(1 + alpha s^2),
    flaa = (c s^2 + 1)/(c s^2/fb + 1),
    fb = (pi/3) s / (xi (d + xi^2)^{1/4}),
    xi = ((3/2) W0(s^{3/2}/(2 sqrt 6)))^{2/3}."""
    s = jnp.maximum(_s_red(rho, grad), 1e-12)   # xi ~ s: guard the 0/0
    xi = (1.5 * _lambertw0(s ** 1.5 / (2.0 * jnp.sqrt(6.0)))) ** (2.0 / 3.0)
    fb = (jnp.pi / 3.0) * s / (xi * (_AM05_D + xi * xi) ** 0.25)
    s2 = s * s
    flaa = (_AM05_C * s2 + 1.0) / (_AM05_C * s2 / fb + 1.0)
    X = 1.0 / (1.0 + _AM05_ALPHA * s2)
    return lda_x(rho) * (X + (1.0 - X) * flaa)


def gga_c_am05(rho, grad):
    """AM05 correlation (libxc GGA_C_AM05, id 135): PW92 LDA scaled by
    the same density-index interpolation, X + (1-X) gamma."""
    s = _s_red(rho, grad)
    X = 1.0 / (1.0 + _AM05_ALPHA * s * s)
    rs = (3.0 / (4.0 * jnp.pi * _safe(rho))) ** (1.0 / 3.0)
    return _safe(rho) * _pw92_eps(rs) * (X + (1.0 - X) * _AM05_GAMMA)


def _scan_alpha_interp(alpha, c1, c2, d):
    """SCAN's alpha interpolation: exp(-c1 a/(1-a)) below a=1,
    -d exp(c2/(1-a)) above; both branches -> 0 smoothly at a=1."""
    oma = 1.0 - alpha
    f_lo = jnp.exp(-c1 * alpha / jnp.where(oma > 0, oma, 1.0))
    f_hi = -d * jnp.exp(c2 / jnp.where(oma < 0, oma, -1.0))
    return jnp.where(oma > 0, f_lo, jnp.where(oma < 0, f_hi, 0.0))


def _scan_alpha(rho, grad, tau):
    tau_w = grad * grad / (8.0 * rho)
    tau_unif = 0.3 * (3.0 * jnp.pi ** 2) ** (2.0 / 3.0) * rho ** (5.0 / 3.0)
    return (jnp.maximum(tau, _TINY) - tau_w) / jnp.maximum(tau_unif, _TINY)


def mgga_x_scan(rho, grad, lap, tau):
    """SCAN exchange (PRL 115, 036402 (2015)), closed shell.  lap is
    accepted for the mgga calling convention but unused (SCAN is
    tau-only, like libxc MGGA_X_SCAN, id 263)."""
    rho = _safe(rho)
    k1, a1 = 0.065, 4.9479
    c1x, c2x, dx, h0x = 0.667, 0.8, 1.24, 1.174
    mu_ak = 10.0 / 81.0
    b2 = jnp.sqrt(5913.0 / 405000.0)
    b1 = 511.0 / 13500.0 / (2.0 * b2)
    b3 = 0.5
    b4 = mu_ak ** 2 / k1 - 1606.0 / 18225.0 - b1 ** 2
    s = _s_red(rho, grad)
    p = s * s
    alpha = _scan_alpha(rho, grad, tau)
    oma = 1.0 - alpha
    fx = _scan_alpha_interp(alpha, c1x, c2x, dx)
    x = (mu_ak * p * (1.0 + (b4 * p / mu_ak)
                      * jnp.exp(-jnp.abs(b4) * p / mu_ak))
         + (b1 * p + b2 * oma * jnp.exp(-b3 * oma * oma)) ** 2)
    h1x = 1.0 + k1 - k1 / (1.0 + x / k1)
    gx = 1.0 - jnp.exp(-a1 / jnp.sqrt(jnp.maximum(s, 1e-20)))
    return lda_x(rho) * (h1x + fx * (h0x - h1x)) * gx


def mgga_c_scan(rho, grad, lap, tau):
    """SCAN correlation (PRL 115, 036402 supplemental), closed shell
    (zeta = 0, phi = 1; libxc MGGA_C_SCAN, id 267): eps = eps1 +
    fc(alpha) (eps0 - eps1) with the single-orbital (eps0) and slowly
    varying (eps1 = PW92 + H1) limits."""
    rho = _safe(rho)
    b1c, b2c, b3c = 0.0285764, 0.0889, 0.125541
    c1c, c2c, dc = 0.64, 1.5, 0.7
    chi_inf, gamma = 0.128026, 0.031091
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    s = _s_red(rho, grad)
    alpha = _scan_alpha(rho, grad, tau)
    # alpha = 0 limit
    eps_lda0 = -b1c / (1.0 + b2c * jnp.sqrt(rs) + b3c * rs)
    w0 = jnp.expm1(-eps_lda0 / b1c)
    ginf = (1.0 + 4.0 * chi_inf * s * s) ** -0.25
    eps0 = eps_lda0 + b1c * jnp.log1p(w0 * (1.0 - ginf))
    # slowly-varying limit: PW92 + gradient correction H1
    eps_lsda = _pw92_eps(rs)
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    t = grad / (2.0 * ks * rho)
    w1 = jnp.maximum(jnp.expm1(-eps_lsda / gamma), _TINY)
    beta_rs = 0.066725 * (1.0 + 0.1 * rs) / (1.0 + 0.1778 * rs)
    A = beta_rs / (gamma * w1)
    g_at2 = (1.0 + 4.0 * A * t * t) ** -0.25
    eps1 = eps_lsda + gamma * jnp.log1p(w1 * (1.0 - g_at2))
    fc = _scan_alpha_interp(alpha, c1c, c2c, dc)
    return rho * (eps1 + fc * (eps0 - eps1))


_FUNCS = {
    "lda_x": (lda_x, 1), "lda_c_vwn": (lda_c_vwn, 1),
    "lda_c_vwn_rpa": (lda_c_vwn_rpa, 1), "lda_c_pz": (lda_c_pz, 1),
    "lda_c_pw": (lda_c_pw, 1),
    "gga_x_pbe": (gga_x_pbe, 2), "gga_x_pbe_r": (gga_x_pbe_r, 2),
    "gga_x_pbe_sol": (gga_x_pbe_sol, 2), "gga_x_rpbe": (gga_x_rpbe, 2),
    "gga_c_pbe": (gga_c_pbe, 2), "gga_c_pbe_sol": (gga_c_pbe_sol, 2),
    "gga_x_b88": (gga_x_b88, 2), "gga_c_lyp": (gga_c_lyp, 2),
    "gga_c_p86": (gga_c_p86, 2),
    "gga_x_pw91": (gga_x_pw91, 2), "gga_c_pw91": (gga_c_pw91, 2),
    "gga_x_wc": (gga_x_wc, 2),
    "gga_x_pw86": (gga_x_pw86, 2),
    "gga_x_optb88_vdw": (gga_x_optb88_vdw, 2),
    "gga_x_optpbe_vdw": (gga_x_optpbe_vdw, 2),
    "hyb_gga_xc_b3lyp": (hyb_gga_xc_b3lyp, 2),
    "hyb_gga_xc_b3lyp5": (hyb_gga_xc_b3lyp5, 2),
    "hyb_gga_xc_b3pw91": (hyb_gga_xc_b3pw91, 2),
    "hyb_gga_xc_pbeh": (hyb_gga_xc_pbeh, 2),
    "gga_x_g96": (gga_x_g96, 2),
    "gga_x_am05": (gga_x_am05, 2), "gga_c_am05": (gga_c_am05, 2),
    "mgga_x_tpss": (mgga_x_tpss, 4), "mgga_c_tpss": (mgga_c_tpss, 4),
    "mgga_x_scan": (mgga_x_scan, 4), "mgga_c_scan": (mgga_c_scan, 4),
}


def xc_eval(func_id: int, *args):
    """Evaluate functional `func_id` (libxc numbering) at batched inputs.

    args: (rho,), (rho, grad) or (rho, grad, lap, tau) depending on the
    functional family. Returns the energy density rho*eps.

    Argument conditioning mirrors the reference's libxc call exactly
    (src/arithmetic@proc.F90:1661-1679): rho clamped at 1e-14 and the
    meta-GGA tau DOUBLED before the evaluation (so the documented input
    `0.5*gkin(id)` feeds the standard total tau to the functional).
    """
    name = XC_IDS.get(int(func_id))
    if name is None:
        raise ValueError(f"unsupported xc functional id {func_id}")
    fn, nargs = _FUNCS[name]
    if len(args) < nargs:
        raise ValueError(f"xc({name}) needs {nargs} field arguments")
    args = list(args[:nargs])
    args[0] = jnp.maximum(args[0], 1e-14)
    if nargs == 4:
        args[3] = 2.0 * args[3]
    return fn(*args)
