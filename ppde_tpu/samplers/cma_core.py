"""Minimal CMA-ES (covariance matrix adaptation) — host-side numpy.

The reference delegates to the `cma` pip package (protein_samplers/
cmaes.py:79-89). The ask/tell covariance update is inherently sequential,
O(popsize * d) work per step — a host-side computation in the reference too
(SURVEY.md §2.2) — so it stays on the host here; only the objective
evaluations (energy of the argmax-discretized candidates) run on TPU,
batched per generation instead of the reference's one-candidate-at-a-time
objective (cmaes.py:60-72).

Implementation follows the standard equations of Hansen's CMA-ES tutorial
(weighted recombination, cumulation paths for sigma and rank-1 update,
rank-mu update, lazy eigendecomposition).
"""
from __future__ import annotations

import numpy as np


class CMAES:
    """Minimize an objective over R^d via ask/tell."""

    def __init__(self, x0: np.ndarray, sigma: float, popsize: int | None = None,
                 seed: int = 0):
        self.dim = d = int(x0.size)
        self.mean = np.asarray(x0, np.float64).copy().ravel()
        self.sigma = float(sigma)
        self.rng = np.random.default_rng(seed)

        self.lam = popsize or 4 + int(3 * np.log(d))
        self.mu = self.lam // 2
        w = np.log(self.mu + 0.5) - np.log(np.arange(1, self.mu + 1))
        self.weights = w / w.sum()
        self.mueff = 1.0 / np.sum(self.weights ** 2)

        self.cc = (4 + self.mueff / d) / (d + 4 + 2 * self.mueff / d)
        self.cs = (self.mueff + 2) / (d + self.mueff + 5)
        self.c1 = 2 / ((d + 1.3) ** 2 + self.mueff)
        self.cmu = min(1 - self.c1,
                       2 * (self.mueff - 2 + 1 / self.mueff)
                       / ((d + 2) ** 2 + self.mueff))
        self.damps = 1 + 2 * max(0.0, np.sqrt((self.mueff - 1) / (d + 1)) - 1) \
            + self.cs
        self.chiN = np.sqrt(d) * (1 - 1 / (4 * d) + 1 / (21 * d ** 2))

        self.pc = np.zeros(d)
        self.ps = np.zeros(d)
        self.C = np.eye(d)
        self.B = np.eye(d)
        self.D = np.ones(d)
        self.invsqrtC = np.eye(d)
        self.eigen_stale = 0
        # lazy eigendecomposition cadence (generations)
        self.eigen_every = max(1, int(1.0 / ((self.c1 + self.cmu) * d * 10)))
        self.generation = 0
        self._last_ask: np.ndarray | None = None

    def _update_eigen(self):
        self.C = np.triu(self.C) + np.triu(self.C, 1).T
        vals, vecs = np.linalg.eigh(self.C)
        vals = np.maximum(vals, 1e-20)
        self.D = np.sqrt(vals)
        self.B = vecs
        self.invsqrtC = vecs @ np.diag(1.0 / self.D) @ vecs.T
        self.eigen_stale = 0

    def ask(self) -> np.ndarray:
        """Sample a generation of candidates, shape [popsize, dim]."""
        z = self.rng.standard_normal((self.lam, self.dim))
        y = (z * self.D) @ self.B.T
        self._last_ask = self.mean + self.sigma * y
        return self._last_ask

    def tell(self, solutions: np.ndarray, fitnesses: np.ndarray) -> None:
        """Update the distribution from evaluated candidates (minimization)."""
        self.generation += 1
        order = np.argsort(fitnesses)
        sel = solutions[order[: self.mu]]
        old_mean = self.mean
        self.mean = self.weights @ sel

        y_mean = (self.mean - old_mean) / self.sigma
        self.ps = (1 - self.cs) * self.ps + np.sqrt(
            self.cs * (2 - self.cs) * self.mueff) * (self.invsqrtC @ y_mean)
        hsig = (np.linalg.norm(self.ps)
                / np.sqrt(1 - (1 - self.cs) ** (2 * self.generation))
                / self.chiN) < (1.4 + 2 / (self.dim + 1))
        self.pc = (1 - self.cc) * self.pc + hsig * np.sqrt(
            self.cc * (2 - self.cc) * self.mueff) * y_mean

        artmp = (sel - old_mean) / self.sigma  # [mu, d]
        self.C = ((1 - self.c1 - self.cmu) * self.C
                  + self.c1 * (np.outer(self.pc, self.pc)
                               + (not hsig) * self.cc * (2 - self.cc) * self.C)
                  + self.cmu * (artmp.T * self.weights) @ artmp)

        self.sigma *= np.exp((self.cs / self.damps)
                             * (np.linalg.norm(self.ps) / self.chiN - 1))
        self.eigen_stale += 1
        if self.eigen_stale >= self.eigen_every:
            self._update_eigen()

    def ask_and_eval(self, objective) -> tuple[np.ndarray, np.ndarray]:
        X = self.ask()
        f = np.asarray(objective(X), np.float64)
        return X, f
