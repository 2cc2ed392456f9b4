"""Single-process numpy/scipy oracle with reference semantics.

This is the golden model for trajectory tests: it reproduces the math and
operation ordering of the reference implementation (/root/reference/src/
sgvamp.py, main.py) in plain numpy/scipy - including its quirks (the no-op
alpha1 clip, the gamw floor after logging, per-cohort N in the gamw update,
damping applied from it=0 only for the LMMSE quantities) - but with all K
cohorts simulated in one process instead of MPI ranks, and with the
Rademacher probes injected so runs are deterministic.

It deliberately leans on scipy for the two numerical kernels the reference
delegates (scipy.sparse.linalg.cg, scipy.optimize.fsolve) so the JAX engine
is validated against independent implementations.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize
import scipy.sparse
from scipy.sparse.linalg import cg as scipy_cg


class ReferenceOracle:
    def __init__(self, Rs, rs, a, Ns, Nt, prior_vars, prior_probs,
                 rho=0.5, gamw=5.0, gam1=1e-6):
        """Rs: list of K (M, M) arrays or scipy sparse matrices (already
        regularized, like the reference's CSR path); rs: (K, M)."""
        self.Rs = [R.tocsr().astype(np.float64) if scipy.sparse.issparse(R)
                   else np.asarray(R, dtype=np.float64) for R in Rs]
        self.rs = np.asarray(rs, dtype=np.float64)
        self.K, self.M = self.rs.shape
        self.a = np.asarray(a, dtype=np.float64)
        self.Ns = np.asarray(Ns, dtype=np.float64)
        self.Nt = float(Nt)
        self.rho = rho
        self.gamw0 = gamw
        self.gam10 = gam1
        self.L = len(prior_probs)
        self.lam = 1.0 - prior_probs[0]
        self.sigmas = np.asarray(prior_vars[1:], dtype=np.float64) * Nt
        self.omegas = np.asarray(
            [p / sum(prior_probs[1:]) for p in prior_probs[1:]], dtype=np.float64
        )
        self.mle_gam = None

    # -- denoiser (reference sgvamp.py:93-114, vectorized over markers) ----
    def denoise(self, r1s, gam1s):
        c = self.a * gam1s
        A = c.sum()
        b = c @ r1s                                   # (M,)
        s2 = 1.0 / (A + 1.0 / self.sigmas)            # (L-1,)
        w = self.omegas * np.sqrt(s2 / self.sigmas)
        mu = np.outer(b, s2)                          # (M, L-1)
        score = 0.5 * np.outer(b * b, s2)
        mx = score.max(axis=1, keepdims=True)
        e = np.exp(score - mx)
        spike = (1.0 - self.lam) * np.exp(-mx[:, 0])
        num = self.lam * (e * mu) @ w
        den = spike + self.lam * e @ w
        xhat = num / den
        dnum = self.lam * (e * (mu * mu + s2)) @ w
        dxdb = (dnum * den - num * num) / (den * den)
        return xhat, dxdb, c

    # -- EM (reference sgvamp.py:116-136 + loop :250-259) ------------------
    def em_sweep(self, r1s, gam1s):
        r2 = (r1s ** 2)[:, :, None]
        v = self.sigmas[None, None, :] + (1.0 / gam1s)[:, None, None]
        E = -r2 / (2.0 * v)
        m = E.max(axis=2, keepdims=True)
        xi = self.lam * self.omegas * np.exp(E - m) / np.sqrt(v)
        sxi = xi.sum(axis=2, keepdims=True)
        xi_t = xi / sxi
        spike = (1.0 - self.lam) * np.exp(-r2 * gam1s[:, None, None] / 2.0 - m) \
            * np.sqrt(gam1s)[:, None, None]
        pi = 1.0 / (1.0 + spike / sxi)
        self.lam = np.mean(np.average(pi, axis=0, weights=self.a))
        aw = self.a[:, None, None]
        self.omegas = (pi * xi_t * aw).sum(axis=(0, 1)) / (pi * aw).sum(axis=(0, 1))

    def em_loop(self, r1s, gam1s, maxit, tol=1e-6):
        for _ in range(maxit):
            old_om, old_lam = self.omegas.copy(), self.lam
            self.em_sweep(r1s, gam1s)
            om_err = np.linalg.norm(self.omegas - old_om) / np.linalg.norm(old_om)
            lam_err = abs(self.lam - old_lam) / self.lam
            if om_err < tol and lam_err < tol:
                break

    # -- MLE via fsolve (reference sgvamp.py:139-194) ----------------------
    def mle_update(self, r1s, gam1s):
        L = self.L
        omega0 = np.concatenate([[1.0 - self.lam], self.lam * self.omegas])
        sigma2 = np.concatenate([[1e-16], self.sigmas])

        v = sigma2[None, None, :] + (1.0 / gam1s)[:, None, None]
        E = -(r1s ** 2)[:, :, None] / (2.0 * v)
        m = E.max()
        probs = np.exp(E - m) / np.sqrt(v)

        def kkt(x):
            omega, gam = x[:L], x[L]
            den = probs @ omega
            y = np.empty(L + 1)
            y[:L] = (self.a[:, None, None] * probs / den[:, :, None]).sum(axis=(0, 1)) \
                + (omega0 - 1.0) / omega + gam
            y[L] = omega.sum() - 1.0
            return y

        x0 = np.concatenate([omega0, [1.0 if self.mle_gam is None else self.mle_gam]])
        x, _, ier, _ = scipy.optimize.fsolve(kkt, x0, full_output=True)
        if ier != 1 or np.any(x[:L] <= 0):
            return
        x[:L] /= x[:L].sum()
        self.lam = 1.0 - x[0]
        self.omegas = x[1:L] / x[1:L].sum()
        self.mle_gam = x[L]

    # -- full run (reference sgvamp.py:196-388) ----------------------------
    def run(self, iterations, u_seq, cg_maxit=500, cg_rtol=1e-5,
            em_prior_maxit=100, learn_gamw=True, lmmse_damp=True,
            prior_update="em", update_prior_from=1):
        K, M = self.K, self.M
        rho = self.rho
        r1s = self.rs.copy()
        gam1s = np.full(K, self.gam10)
        gamws = np.full(K, self.gamw0)
        xhat1 = np.zeros(M)
        alpha1 = np.zeros(K)
        alpha2 = np.zeros(K)
        xhat2 = np.zeros((K, M))
        sigma2_u = np.zeros((K, M))
        sparse = any(scipy.sparse.issparse(R) for R in self.Rs)
        I = scipy.sparse.identity(M, format="csr") if sparse else np.eye(M)

        hist = {"xhat1": [], "params": [], "r1_in": [], "lam": []}
        for it in range(iterations):
            if it >= update_prior_from:
                if prior_update == "em":
                    self.em_loop(r1s, gam1s, em_prior_maxit)
                elif prior_update == "mle":
                    self.mle_update(r1s, gam1s)

            hist["r1_in"].append(r1s.copy())
            xh_new, dxdb, c = self.denoise(r1s, gam1s)
            if it > 0:
                xhat1 = rho * xh_new + (1 - rho) * xhat1
            else:
                xhat1 = xh_new
            a1_new = c * dxdb.mean()
            alpha1 = rho * a1_new + (1 - rho) * alpha1 if it > 0 else a1_new
            # NOTE: reference's np.clip here is a no-op (result discarded).

            gam2 = gam1s * (1 - alpha1) / alpha1
            r2 = (xhat1[None, :] - alpha1[:, None] * r1s) / (1 - alpha1)[:, None]

            new_r1s = np.empty_like(r1s)
            new_gam1s = np.empty(K)
            rows = []
            for k in range(K):
                A = gamws[k] * self.Rs[k] + gam2[k] * I
                mu2 = gamws[k] * self.rs[k] + gam2[k] * r2[k]
                xh2, _ = scipy_cg(A, mu2, maxiter=cg_maxit, x0=xhat2[k], rtol=cg_rtol)
                if lmmse_damp:
                    xh2 = rho * xh2 + (1 - rho) * xhat2[k]
                u = u_seq[it, k]
                s2u, _ = scipy_cg(A, u, maxiter=cg_maxit, x0=sigma2_u[k], rtol=cg_rtol)
                tr = u @ s2u
                a2 = gam2[k] * tr / M
                if lmmse_damp:
                    a2 = rho * a2 + (1 - rho) * alpha2[k]
                new_gam1s[k] = gam2[k] * (1 - a2) / a2
                new_r1s[k] = (xh2 - a2 * r2[k]) / (1 - a2)
                if learn_gamw:
                    z = self.Ns[k] - 2 * xh2 @ self.rs[k] + xh2 @ self.Rs[k] @ xh2
                    z = max(z, 0.0)
                    tr_r = u @ (self.Rs[k] @ s2u)
                    gamws[k] = 1.0 / (z / self.Ns[k] + tr_r / self.Ns[k])
                gamw_floored = max(gamws[k], 1.0)
                gamws[k] = gamw_floored
                xhat2[k] = xh2
                sigma2_u[k] = s2u
                alpha2[k] = a2
                rows.append([it, gamw_floored, new_gam1s[k], gam2[k],
                             alpha1[k], a2, self.lam])
            r1s, gam1s = new_r1s, new_gam1s
            hist["xhat1"].append(xhat1.copy())
            hist["params"].append(rows)
            hist["lam"].append(self.lam)
        return hist
