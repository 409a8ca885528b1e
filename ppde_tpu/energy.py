"""Product-of-experts energy composition.

Parity with the reference energy layer (ppde/energy.py:13-164): four energy
families with a uniform API —
  * ``energy(params, x) -> (e, fit)``
  * ``energy_and_grad(params, x) -> (e, fit, grad_x)``
  * ``fitness(params, x) -> fit``  (the reference's get_supervised_expert)

All parameters live in ``Energy.params`` and are passed EXPLICITLY through
jit boundaries — closing over multi-MB coupling matrices would bake them
into the compiled HLO as constants (measured: ~300s compile for a GFP-sized
Potts vs ~1s with explicit arguments).

Differences from the reference by design:
  * energies are pure functions, jit/vmap/scan-safe;
  * the Potts gradient is analytic (one shared MXU matmul; potts.py), so the
    fused energy+grad evaluation pays no autodiff backward for the
    unsupervised term (reference pays a full backward, energy.py:103-132);
  * the reference's minibatched transformer loop (energy.py:114-130) becomes
    an optional ``lax.map`` over chain chunks — one compiled program;
  * the reference's MNIST PoE ``self.supervised`` AttributeError
    (energy.py:42) is fixed: the supervised ensemble is what's called.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ppde_tpu.models import cnn, mnist_nets
from ppde_tpu.models import potts as potts_mod
from ppde_tpu.ops import cnn_pallas

# Cap on python-unrolled transformer chunk bodies per compiled program:
# compile time scales with the inline copy count (through the remote
# tunnel: ~3-4 min per novel shape), and the unroll's scheduling win was
# measured in the 8-chunk regime (B=128 / chunk 16). Larger batches run
# lax.map over groups of this many unrolled chunks.
MAX_UNROLLED_CHUNKS = 8


@dataclass(frozen=True)
class Energy:
    """Uniform energy API consumed by every sampler.

    The callables take ``params`` (a pytree, = ``self.params``) as their
    first argument so samplers can thread it through jit explicitly.
    """

    params: Any
    energy: Callable
    energy_and_grad: Callable
    fitness: Callable
    wt_onehot: Any = None  # [1, L, V] wild-type one-hot (protein domains)


def _vjp_sum(f, x):
    """(f(x), d sum(f(x)) / dx) without materializing a Jacobian."""
    y, vjp = jax.vjp(f, x)
    (gx,) = vjp(jnp.ones_like(y))
    return y, gx


# ---------------------------------------------------------------------------
# protein energies
# ---------------------------------------------------------------------------

def _fit_and_grad(p, x, compute_dtype, fused_cnn, interpret=False,
                  cnn_chunk=None, pool_bwd="split"):
    """Supervised CNN (fitness, d mean-fitness/dx): fused Pallas kernel or
    the XLA VJP path. The fused kernel (ops/cnn_pallas.py) keeps all
    ensemble activations VMEM-resident; measured in-step at GFP shapes the
    two paths tie at 128 chains (~0.6 ms, both at the matmul floor) and
    the kernel wins 30%+ at 1024 (4.89 vs 7.05 ms/eval — PERF.md roofline).

    cnn_chunk: lax.map the evaluation over chain chunks of this size.
    Large batches scale superlinearly in one XLA program (GFP 1024 chains:
    8.8 ms full vs 6.2 ms at chunk 128 for the VJP path; 7.2 vs 4.9 ms for
    the fused kernel) — chunking restores linear scaling."""
    def one(xc):
        if fused_cnn:
            return cnn_pallas.ensemble_apply_and_grad(
                p["sup"], xc, compute_dtype=compute_dtype or jnp.bfloat16,
                interpret=interpret, pool_bwd=pool_bwd)
        return _vjp_sum(
            lambda v: cnn.ensemble_apply(p["sup"], v,
                                         compute_dtype=compute_dtype,
                                         pool_bwd=pool_bwd), xc)

    n = x.shape[0]
    if not cnn_chunk or n <= cnn_chunk or n % cnn_chunk:
        return one(x)
    xs = x.reshape(n // cnn_chunk, cnn_chunk, *x.shape[1:])
    fits, gs = jax.lax.map(one, xs)
    return fits.reshape(n), gs.reshape(x.shape)


def protein_poe(potts_params: potts_mod.PottsParams | None, sup_ensemble,
                lam: float, wt_onehot, transformer=None,
                chunk_size: int | None = None,
                compute_dtype=None, fused_cnn: bool = False,
                interpret: bool = False,
                cnn_chunk: int | None = None,
                pool_bwd: str = "split") -> Energy:
    """E(x) = unsup_delta(x) + lam * fitness(x) over [N, L_full, V] one-hots.

    ``transformer``: optional (params, apply_fn) pair adding an ESM2
    pseudo-log-likelihood delta term (reference 'transformer' /
    'potts+transformer' experts, energy.py:83-89). ``potts_params`` may be
    None for transformer-only. ``chunk_size`` maps the transformer (and its
    gradient) over chain chunks to bound memory for large models.
    ``compute_dtype``: optional bf16 cast of the supervised-CNN compute
    (the TPU analog of the reference's AMP autocast, nets.py:230).
    ``fused_cnn``: route energy_and_grad's supervised term through the
    fused Pallas forward+input-gradient kernel (bf16 unless compute_dtype
    says otherwise); ``interpret`` runs that kernel in interpret mode
    (CPU tests).
    """
    params = {"sup": sup_ensemble}
    if potts_params is not None:
        params["potts"] = potts_params
    t_apply = None
    if transformer is not None:
        params["tr"] = transformer[0]
        t_apply = transformer[1]

    def fit_fn(p, x):
        return cnn.ensemble_apply(p["sup"], x, compute_dtype=compute_dtype)

    def energy(p, x):
        fit = fit_fn(p, x)
        e = lam * fit
        if "potts" in p:
            e = e + potts_mod.score(p["potts"], x, delta=True)
        if t_apply is not None:
            e = e + t_apply(p["tr"], x)
        return e, fit

    def transformer_score_and_grad(p, x):
        def one_chunk(xc):
            return _vjp_sum(lambda v: t_apply(p["tr"], v), xc)

        if chunk_size is None or x.shape[0] <= chunk_size:
            return one_chunk(x)
        # UNROLLED python loop, NOT lax.map: honest all-outputs-consumed
        # probes (tools/probe_esm_dce.py — dep-threaded AND consuming
        # every chunk's outputs; chunk0-only probes get 7/8 chunks
        # dead-code-eliminated) at B=128 ESM2-S energy+grad: unrolled
        # chunk-16 63.3 ms < lax.map chunk-64 93.7 < monolithic 105.0.
        # Independent chunk subgraphs give the scheduler ILP to hide the
        # latency-bound hd=24 attention cores (marginal chunk ~4.6 ms vs
        # 30.8 for one alone); a rolled lax.map loop cannot overlap
        # iterations (chunking also bounds 650M vjp-residual memory).
        # The unroll is CAPPED at MAX_UNROLLED_CHUNKS bodies: HLO size
        # (and the remote tunnel's ~3-4 min/novel-shape compile) scales
        # with the inline copy count, and the ILP win was measured in the
        # 8-chunk regime. Beyond the cap, lax.map over GROUPS of
        # MAX_UNROLLED_CHUNKS unrolled chunks — one compiled group body,
        # full ILP within a group, linear scaling across groups.
        n = x.shape[0]
        n_chunks = -(-n // chunk_size)
        if n_chunks <= MAX_UNROLLED_CHUNKS:
            outs = [one_chunk(x[i:i + chunk_size])
                    for i in range(0, n, chunk_size)]
            return (jnp.concatenate([e for e, _ in outs]),
                    jnp.concatenate([g for _, g in outs]))
        group = chunk_size * MAX_UNROLLED_CHUNKS
        n_pad = -(-n // group) * group
        xp = (jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (n_pad - n,) + x.shape[1:])])
            if n_pad > n else x)
        xg = xp.reshape(n_pad // group, group, *x.shape[1:])

        def group_fn(xgrp):
            outs = [one_chunk(xgrp[i:i + chunk_size])
                    for i in range(0, group, chunk_size)]
            return (jnp.concatenate([e for e, _ in outs]),
                    jnp.concatenate([g for _, g in outs]))

        es, gs = jax.lax.map(group_fn, xg)
        return (es.reshape(n_pad)[:n],
                gs.reshape(n_pad, *x.shape[1:])[:n])

    def energy_and_grad(p, x):
        fit, fit_grad = _fit_and_grad(p, x, compute_dtype, fused_cnn,
                                      interpret, cnn_chunk, pool_bwd)
        e = lam * fit
        grad = lam * fit_grad
        if "potts" in p:
            pe, pg = potts_mod.score_and_grad(p["potts"], x, delta=True)
            e = e + pe
            grad = grad + pg
        if t_apply is not None:
            te, tg = transformer_score_and_grad(p, x)
            e = e + te
            grad = grad + tg
        return e, fit, grad

    return Energy(params=params, energy=energy,
                  energy_and_grad=energy_and_grad, fitness=fit_fn,
                  wt_onehot=wt_onehot)


def protein_supervised(sup_ensemble, wt_onehot, compute_dtype=None,
                       fused_cnn: bool = False,
                       interpret: bool = False,
                       cnn_chunk: int | None = None,
                       pool_bwd: str = "split") -> Energy:
    """Supervised-only ablation: E(x) = fitness(x) (energy.py:143-164)."""
    params = {"sup": sup_ensemble}

    def fit_fn(p, x):
        return cnn.ensemble_apply(p["sup"], x, compute_dtype=compute_dtype)

    def energy(p, x):
        fit = fit_fn(p, x)
        return fit, fit

    def energy_and_grad(p, x):
        fit, g = _fit_and_grad(p, x, compute_dtype, fused_cnn, interpret,
                               cnn_chunk, pool_bwd)
        return fit, fit, g

    return Energy(params=params, energy=energy,
                  energy_and_grad=energy_and_grad, fitness=fit_fn,
                  wt_onehot=wt_onehot)


# ---------------------------------------------------------------------------
# MNIST energies (binary images; x2 evolves, x1 is the fixed summand)
# ---------------------------------------------------------------------------

def mnist_poe(unsup_params, sup_ensemble, lam: float,
              unsup_kind: str = "ebm") -> Energy:
    """E(x2; x1) = log p_unsup(x2) + lam * predicted_sum(x1, x2).

    unsup_kind: 'ebm' (ResNet EBM + Bernoulli base, mlp.py:175-196) or
    'dae' (reconstruction log-prob, nets.py:162-168). Parity with
    MNISTProductOfExperts (energy.py:13-51), with the supervised-attr bug
    fixed.
    """
    log_prob = (mnist_nets.ebm_log_prob if unsup_kind == "ebm"
                else mnist_nets.dae_log_prob)
    params = {"unsup": unsup_params, "sup": sup_ensemble}

    def fit_fn(p, x2, x1):
        return mnist_nets.regression_ensemble_apply(p["sup"], x1, x2)

    def energy(p, x2, x1):
        fit = fit_fn(p, x2, x1)
        return log_prob(p["unsup"], x2) + lam * fit, fit

    def energy_and_grad(p, x2, x1):
        def e_fn(v):
            fit = fit_fn(p, v, x1)
            e = log_prob(p["unsup"], v) + lam * fit
            return jnp.sum(e), (e, fit)

        (_, (e, fit)), grad = jax.value_and_grad(e_fn, has_aux=True)(x2)
        return e, fit, grad

    return Energy(params=params, energy=energy,
                  energy_and_grad=energy_and_grad, fitness=fit_fn)


def mnist_supervised(sup_ensemble) -> Energy:
    """Supervised-only MNIST energy (energy.py:54-68)."""
    params = {"sup": sup_ensemble}

    def fit_fn(p, x2, x1):
        return mnist_nets.regression_ensemble_apply(p["sup"], x1, x2)

    def energy(p, x2, x1):
        fit = fit_fn(p, x2, x1)
        return fit, fit

    def energy_and_grad(p, x2, x1):
        fit, g = _vjp_sum(lambda v: fit_fn(p, v, x1), x2)
        return fit, fit, g

    return Energy(params=params, energy=energy,
                  energy_and_grad=energy_and_grad, fitness=fit_fn)
