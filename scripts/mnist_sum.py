"""MNIST-sum experiment CLI (toy domain: maximize the sum of two digits).

Flag-surface and artifact parity with the reference entry point
(scripts/mnist_sum.py:61-182): same wild-type seed pairs, sampler/expert
options, and gif/plots/viz/csv outputs. Energies/oracle load the reference's
committed .pt checkpoints via the torch converters.
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WT_FILES = {
    0: ("3_0.npy", "3_1.npy"),
    1: ("29_0.npy", "29_1.npy"),
    2: ("38_0.npy", "38_1.npy"),
    3: ("99_0.npy", "99_1.npy"),
    4: ("149_0.npy", "149_1.npy"),
    -1: ("validation_0.npy", "validation_1.npy"),
}


def build_energy(args):
    import jax
    import jax.numpy as jnp

    from ppde_tpu import energy as energy_mod
    from ppde_tpu.models import torch_convert

    w = Path(args.mnist_weights)
    ens = jax.tree.map(jnp.asarray, torch_convert.mnist_regression_ensemble(
        [str(w / f"ensemble_{i}_ckpt_25000.pt") for i in range(3)]))

    if args.energy_function == "supervised":
        return energy_mod.mnist_supervised(ens)

    def load_unsup(torch_name, npz_glob, converter, init_like):
        """Reference .pt checkpoint if present, else our trainer's .npz
        (the reference's EBM/DAE blobs are missing upstream — train
        replacements with scripts/train_binary_mnist_{ebm,dae}.py)."""
        import glob

        from ppde_tpu import training

        pt = w / torch_name
        if pt.exists():
            return jax.tree.map(jnp.asarray, converter(str(pt)))
        npzs = sorted(glob.glob(str(w / npz_glob)))
        if npzs:
            params, _ = training.load_ckpt(npzs[-1], init_like)
            return params
        raise FileNotFoundError(
            f"neither {pt} nor {w / npz_glob} exists; the reference repo's "
            "blob is missing — train one with scripts/train_binary_mnist_"
            f"{args.unsupervised_expert}.py")

    if args.unsupervised_expert == "ebm":
        eps = 1e-2
        mean = np.load(os.path.join(args.data_dir, "mnist_mean.npy")).reshape(-1)
        mean = mean * (1.0 - 2 * eps) + eps
        init_like = mnist_nets_init_ebm(mean)
        params = load_unsup("mnist_ebm.pt", "mnist_ebm_ckpt_*.npz",
                            torch_convert.resnet_ebm, init_like)
        params["mean"] = jnp.asarray(mean, jnp.float32)
        return energy_mod.mnist_poe(params, ens, args.energy_lamda, "ebm")
    if args.unsupervised_expert == "dae":
        init_like = mnist_nets_init_dae()
        params = load_unsup("mnist_binary_dae.pt", "mnist_binary_dae_ckpt_*.npz",
                            torch_convert.dae, init_like)
        return energy_mod.mnist_poe(params, ens, args.energy_lamda, "dae")
    raise ValueError(args.unsupervised_expert)


def mnist_nets_init_ebm(mean):
    import jax

    from ppde_tpu.models import mnist_nets

    return mnist_nets.ebm_init(jax.random.PRNGKey(0), n_channels=64,
                               mean=mean)


def mnist_nets_init_dae():
    import jax

    from ppde_tpu.models import mnist_nets

    return mnist_nets.dae_init(jax.random.PRNGKey(0), latent_dim=16,
                               n_channels=64)


def get_sampler_runner(args):
    import jax

    from ppde_tpu.samplers.mnist import cmaes, mala_approx, ppde, sa

    key = jax.random.PRNGKey(args.seed)
    ck = getattr(args, "checkpoint_dir", None) or None
    if args.sampler == "PPDE":
        abbrv = (f"PPDE-PAS-{args.ppde_pas_length}" if args.ppde_pas_length > 0
                 else f"PPDE-GWG-{args.ppde_gwg_samples}")
        cfg = ppde.MNISTPPDEConfig(pas_length=args.ppde_pas_length,
                                   gwg_samples=args.ppde_gwg_samples)
        return (lambda **kw: ppde.run(cfg=cfg, key=key, checkpoint_dir=ck,
                                      **kw)), abbrv
    if args.sampler == "PPDE-PT":
        from ppde_tpu.samplers.mnist import pt

        cfg = pt.MNISTPTConfig(pas_length=args.ppde_pas_length,
                               gwg_samples=args.ppde_gwg_samples,
                               n_levels=args.pt_levels,
                               beta_min=args.pt_beta_min,
                               swap_every=args.pt_swap_every)
        return (lambda **kw: pt.run(cfg=cfg, key=key, checkpoint_dir=ck,
                                    **kw)), "PPDE-PT"
    if args.sampler == "simulated_annealing":
        cfg = sa.MNISTSAConfig(temp=args.simulated_annealing_temp,
                               muts_per_seq_param=args.muts_per_seq_param,
                               decay_rate=args.decay_rate)
        return (lambda **kw: sa.run(cfg=cfg, key=key, checkpoint_dir=ck,
                                    **kw)), "SA"
    if args.sampler == "MALA-approx":
        cfg = mala_approx.MNISTMALAConfig(
            step_size=args.diffusion_step_size,
            relaxation_tau=args.diffusion_relaxation_tau)
        return (lambda **kw: mala_approx.run(cfg=cfg, key=key,
                                             checkpoint_dir=ck, **kw)), \
            "MALA-approx"
    if args.sampler == "CMAES":
        cfg = cmaes.MNISTCMAESConfig(
            population_size=args.cmaes_population_size,
            initial_variance=args.cmaes_initial_variance)
        return (lambda **kw: cmaes.run(cfg=cfg, seed=args.seed,
                                       checkpoint_dir=ck, **kw)), "CMAES"
    raise ValueError(args.sampler)


def main(args):
    from ppde_tpu import runtime as _rt
    _rt.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ppde_tpu import metrics
    from ppde_tpu.models import torch_convert, mnist_nets

    np.random.seed(args.seed)
    Path(args.results_path).mkdir(parents=True, exist_ok=True)

    energy = build_energy(args)

    oracle_params = jax.tree.map(jnp.asarray, torch_convert.mnist_regression(
        str(Path(args.mnist_weights) / "one-hot_GT_ckpt_60000.pt")))
    oracle = (oracle_params,
              lambda p, x2, x1: mnist_nets.regression_apply(p, x1, x2))

    fa, fb = WT_FILES[args.wild_type]
    a = np.load(os.path.join(args.data_dir, fa)).reshape(784)
    b = np.load(os.path.join(args.data_dir, fb)).reshape(784)
    pop = np.concatenate([np.tile(a, (args.n_chains, 1)),
                          np.tile(b, (args.n_chains, 1))], 1).astype(np.float32)

    runner, abbrv = get_sampler_runner(args)
    abbrv += f"_{args.energy_function}"
    if args.suffix:
        abbrv += f"_{args.suffix}"

    res = runner(energy=energy, initial_population=jnp.asarray(pop),
                 num_steps=args.n_iters, oracle=oracle,
                 log_every=args.log_every)
    print(f"sampler throughput: {res.steps_per_sec:.1f} steps/s", flush=True)

    m = args.metrics.split("+")
    # histories are thinned to oracle cadence for plots/CSVs (reference
    # keeps fitness at log steps only, mnist ppde.py:153-156). MCMC
    # samplers record fitness EVERY step; CMA-ES records at log cadence
    # already — derive the stride from the recorded lengths so CSV step
    # labels are correct for both.
    orc_hist = res.oracle_history
    if len(res.fitness_history) > len(orc_hist) >= 1:
        # MCMC: fitness row s == step s (fit0 prepended); oracle recorded
        # at segment boundaries [0, log_every, ..., n_iters] (tail segment
        # may be ragged when n_iters % log_every != 0 — a uniform stride
        # would misalign every row after the first in that case)
        steps = np.minimum(np.arange(len(orc_hist)) * args.log_every,
                           len(res.fitness_history) - 1)
        fit_hist = res.fitness_history[steps]
    else:
        fit_hist = res.fitness_history  # CMA-ES: already log-cadence
    n = min(len(fit_hist), len(orc_hist))
    if "plots" in m and n > 0:
        metrics.mnist_performance_plots(fit_hist[:n], orc_hist[:n], abbrv, args)
    if "viz" in m:
        metrics.visualize_population(res.final_x, abbrv, args)
    if "csv" in m and n > 0:
        metrics.mnist_scores_to_csv(fit_hist[:n], orc_hist[:n], abbrv, args)
    if "gif" in m and res.random_traj is not None:
        stride_gif = max(1, len(res.random_traj) // args.gif_frames)
        metrics.make_gif(res.random_traj[::stride_gif], abbrv, args)
    print("done")
    return res


def build_parser():
    p = argparse.ArgumentParser()
    g = p.add_argument_group("general")
    g.add_argument("--mnist_weights", type=str, default="weights/mnist_models")
    g.add_argument("--data_dir", type=str, default="data/mnist")
    g.add_argument("--results_path", type=str, default="results/mnist")
    g.add_argument("--wild_type", type=int, default=0)
    g.add_argument("--seed", type=int, default=1234567)
    g.add_argument("--device", type=str, default="tpu",
                   help="accepted for reference compatibility; ignored")
    g.add_argument("--n_iters", type=int, default=200)
    g.add_argument("--n_chains", type=int, default=128)
    g.add_argument("--energy_lamda", type=float, default=10)
    g.add_argument("--energy_function", type=str, default="product_of_experts")
    g.add_argument("--unsupervised_expert", type=str, default="ebm")
    g.add_argument("--log_every", type=int, default=50)
    g.add_argument("--sampler", type=str, default="simulated_annealing")
    g.add_argument("--suffix", type=str, default="")
    g.add_argument("--checkpoint_dir", type=str, default="",
                   help="persist sampler state here and auto-resume "
                        "(capability absent from the reference)")
    g.add_argument("--metrics", type=str, default="gif+plots+viz+csv")
    g.add_argument("--gif_frames", type=int, default=200)

    sa_g = p.add_argument_group("simulated_annealing")
    sa_g.add_argument("--simulated_annealing_temp", type=float, default=10)
    sa_g.add_argument("--muts_per_seq_param", type=float, default=5)
    sa_g.add_argument("--decay_rate", type=float, default=0.999)

    d = p.add_argument_group("mala_approx")
    d.add_argument("--diffusion_step_size", type=float, default=0.01)
    d.add_argument("--diffusion_relaxation_tau", type=float, default=0.9)

    c = p.add_argument_group("cmaes")
    c.add_argument("--cmaes_population_size", type=int, default=16)
    c.add_argument("--cmaes_initial_variance", type=float, default=0.1)

    pp = p.add_argument_group("ppde")
    pp.add_argument("--ppde_gwg_samples", type=int, default=1)
    pp.add_argument("--ppde_pas_length", type=int, default=10)
    pp.add_argument("--pt_levels", type=int, default=8,
                    help="PPDE-PT: temperature levels (n_chains %% levels "
                         "== 0; beyond-reference parallel tempering, "
                         "samplers/mnist/pt.py)")
    pp.add_argument("--pt_beta_min", type=float, default=0.25,
                    help="PPDE-PT: hottest inverse temperature (geometric "
                         "ladder down from 1.0)")
    pp.add_argument("--pt_swap_every", type=int, default=1,
                    help="PPDE-PT: attempt replica exchanges every this "
                         "many steps")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
