"""ppde_tpu — TPU-native Plug & Play Directed Evolution.

A ground-up JAX/XLA/Pallas re-design of the capabilities of pemami4911/ppde
(reference layout documented in SURVEY.md): product-of-experts energies over
discrete one-hot sequences, gradient-informed discrete MCMC samplers
(PPDE/PAS, GWG), and baselines (simulated annealing, MALA-approx, CMA-ES,
random search), with batched Markov chains as a sharded leading axis.

Design principles (TPU-first, not a port):
  * samplers are pure ``(state, key) -> (state, stats)`` step functions driven
    by ``lax.scan``; chains are a batch dimension, never a Python loop.
  * energies are closed-over pure functions ``x -> (e, fit)`` with fused
    value-and-gradient evaluation (analytic for Potts, autodiff elsewhere).
  * histories accumulate on-device; host I/O happens at run-segment
    boundaries only.
  * multi-chip scaling via ``jax.sharding.Mesh`` (chains = data-parallel
    axis; ensembles/PoE experts evaluated via stacked-parameter ``vmap``).
"""

__version__ = "0.1.0"

from ppde_tpu import codec, io, utils  # noqa: F401
