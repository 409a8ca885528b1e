"""Domain-agnostic parallel-tempering machinery (beyond-reference).

The reference framework has no tempering anywhere; ppde_tpu adds replica
exchange as a first-class sampler in BOTH domains (protein substitutions
and MNIST bit flips) on top of this shared core:

  * ``ladder`` — the geometric inverse-temperature ladder, replicated to a
    per-chain [n] array (level = chain // M, level 0 cold);
  * ``make_exchange`` — one alternating even/odd replica-exchange phase as
    pure batch-dim algebra: partner selection is a [K, K] one-hot
    permutation matrix contracted against the level axis (a matmul — XLA
    lowers it to fast select/reduce code, unlike dynamic gathers which
    serialize on TPU), both ends of a pair share one uniform draw (the
    lower level's) so the accept decision is symmetric, and state movement
    is a masked select over ``reshape(K, -1)`` — generic over any per-chain
    trailing shape ([L, V] one-hots, [D] bit vectors, gradients).

Detailed balance: the exchange move is its own involution with symmetric
proposal probability (parity is deterministic from the carried step
counter, partner choice is deterministic given parity), so
P(swap) = min(1, exp((beta_i - beta_j) (E_j - E_i))) satisfies detailed
balance for the product measure prod_l pi_l, pi_l ~ exp(beta_l E). Gold
stationarity tests in BOTH domains (tests/test_pt.py,
tests/test_mnist_samplers.py) verify every level samples its exact
tempered Boltzmann with the full machinery running.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ladder(n_chains: int, n_levels: int, beta_min: float) -> np.ndarray:
    """Per-chain inverse temperatures [n_chains]; level = chain // M with
    M = n_chains // n_levels. Level 0 is the cold (beta=1) chain block;
    beta_l = beta_min ** (l / (K-1)) (geometric)."""
    if n_chains % n_levels:
        raise ValueError(
            f"n_chains={n_chains} must be divisible by n_levels={n_levels}")
    if not (0.0 < beta_min <= 1.0):
        raise ValueError(f"beta_min must be in (0, 1], got {beta_min}")
    k = np.arange(n_levels, dtype=np.float64)
    denom = max(n_levels - 1, 1)
    betas = beta_min ** (k / denom)
    return np.repeat(betas, n_chains // n_levels).astype(np.float32)


def make_exchange(n: int, n_levels: int, swap_every: int):
    """Build the replica-exchange phase.

    Returns ``phase(betas_per_chain, e, count, key, arrays) -> (swapped
    arrays, n_swapped)`` where ``arrays`` is a list of per-chain arrays
    (leading dim n) to move between levels when a swap is accepted —
    typically [x, e, fit, grad]; the carried grad must be RAW dE/dx (beta
    applied at use sites) so states swap without rescaling.
    """
    K = n_levels
    M = n // K
    iota_k = jnp.arange(K, dtype=jnp.int32)

    def phase(beta, e, count, key, arrays):
        parity = (count // swap_every) % 2
        gate = (count % swap_every) == 0
        sgn = 1 - 2 * ((iota_k - parity) % 2)            # +1 pairs up, -1 down
        partner = iota_k + sgn
        valid = (partner >= 0) & (partner < K)
        partner = jnp.where(valid, partner, iota_k)      # edges self-pair
        P = (iota_k[None, :] == partner[:, None]).astype(jnp.float32)  # [K,K]

        betas_lvl = beta.reshape(K, M)[:, 0]
        e_lvl = e.reshape(K, M)
        e_part = P @ e_lvl                               # [K, M]
        beta_part = P @ betas_lvl
        # symmetric under l <-> partner: both ends compute the same value
        log_acc = (betas_lvl - beta_part)[:, None] * (e_part - e_lvl)

        u = jax.random.uniform(key, (K, M))
        u_shared = jnp.where((iota_k < partner)[:, None], u, P @ u)
        swap = ((jnp.log(u_shared) < log_acc)
                & valid[:, None] & gate)                 # [K, M]

        def exchange(v):
            flat = v.reshape(K, -1)
            part = P @ flat.astype(jnp.float32)
            s = jnp.broadcast_to(swap[..., None],
                                 (K, M, flat.shape[1] // M)).reshape(K, -1)
            return jnp.where(s, part, flat.astype(jnp.float32)) \
                      .astype(v.dtype).reshape(v.shape)

        n_swapped = jnp.sum(swap & (sgn > 0)[:, None])
        return [exchange(v) for v in arrays], n_swapped

    return phase
