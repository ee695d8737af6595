"""Fit minimal-degree odd polynomials for the bf16 GELU kernel path.

Decomposition used by the fused FFN backward (shared CDF term):
  c  = 0.5*(1 + x*P(x^2)),  x = clip(h,±HC·√2)/√2    (erf odd poly)
  g  = h * c                                          (gelu)
  d  = c + s*S(s^2),        s = clip(h,±SC)           (dgelu; S ≈ phi fit)

Forward kernel uses only P. Fits are Lawson-iterated weighted least squares
in a CHEBYSHEV basis over t = x^2 (stable to high degree), converted to the
power basis afterwards and re-validated on a dense grid.

Error targets (abs, well under bf16 output rounding of the kernels):
  gelu  <= ~1.2e-3   (bf16 ulp at |y|=1 is 7.8e-3)
  dgelu <= ~2.5e-3
"""
import numpy as np
from numpy.polynomial import chebyshev as C
from scipy.special import erf
from scipy.stats import norm

HC = 3.75   # erf arg clip (x domain, h clip = HC*sqrt2 = 5.303)
SC = 5.2    # h clip for the phi poly


def lawson_fit_cheb(f, xmax, nterms, iters=200, pin_end=True):
    """Fit odd poly x*P(x^2) to f on [0, xmax] with P expressed in a
    Chebyshev basis over t=x^2 in [0, xmax^2]. Returns power-basis coeffs of
    P (ascending in t) and the validated max abs err of the converted poly."""
    n = 6000
    th = np.pi * (np.arange(n) + 0.5) / n
    x = xmax * np.sqrt((1 - np.cos(th)) / 2)  # cheb-ish nodes in t
    t = x * x
    y = f(x)
    tmax = xmax * xmax
    u = 2 * t / tmax - 1  # map to [-1, 1]
    A = np.stack([x * C.chebval(u, [0] * j + [1]) for j in range(nterms)],
                 axis=1)
    w = np.ones(n)
    best = None
    for _ in range(iters):
        ww = np.sqrt(w)
        if pin_end:
            ww[-1] = max(ww[-1], 1e4)
        c, *_ = np.linalg.lstsq(A * ww[:, None], y * ww, rcond=None)
        r = np.abs(A @ c - y)
        if best is None or r.max() < best[1]:
            best = (c, r.max())
        w = w * (1e-14 + r)
        w *= n / w.sum()
    c = best[0]
    # convert cheb(u) -> power in t
    pu = C.cheb2poly(c)                      # power series in u
    # u = (2/tmax) t - 1: compose
    pt = np.zeros(nterms)
    acc = np.zeros(nterms)
    acc[0] = 1.0
    for k, a in enumerate(pu):
        pt[: k + 1] += a * acc[: k + 1]
        # acc *= u(t) for next power
        nxt = np.zeros(nterms)
        nxt[: nterms] += -1.0 * acc
        nxt[1:] += (2 / tmax) * acc[:-1]
        acc = nxt
    # validate power form on dense grid
    xv = np.linspace(0, xmax, 20001)
    tv = xv * xv
    pv = np.zeros_like(tv)
    for a in pt[::-1]:
        pv = pv * tv + a
    err = np.max(np.abs(xv * pv - f(xv)))
    return pt, err


def main():
    sqrt2 = np.sqrt(2.0)

    print("== erf(x) = x*P(x^2), x in [0, %.2f] ==" % HC)
    for nt in range(5, 11):
        c, err = lawson_fit_cheb(erf, HC, nt)
        gerr = 0.5 * HC * sqrt2 * err
        print(f"terms {nt}: erf err {err:.2e} -> worst gelu err {gerr:.2e}")
        if gerr < 1.2e-3:
            print("   ERF coeffs:", tuple(float(v) for v in c))
            break

    print("== h*phi(h) = s*S(s^2), s in [0, %.2f] ==" % SC)
    f = lambda s: s * norm.pdf(s)
    for nt in range(5, 13):
        c, err = lawson_fit_cheb(lambda x: norm.pdf(x), SC, nt)
        # fitting phi directly as odd x*S? phi is EVEN. Fit h*phi as odd:
        c, err = lawson_fit_cheb(f, SC, nt)
        print(f"terms {nt}: hphi err {err:.2e}")
        if err < 2.0e-3:
            print("   HPHI coeffs:", tuple(float(v) for v in c))
            break


if __name__ == "__main__":
    main()
