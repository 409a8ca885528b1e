"""bench.py smoke: the driver runs it on real TPU at end of round, so a
config that fails to build would silently cost the round's headline. Build
each config's energy+step at tiny sizes on CPU and take a few steps."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.mark.parametrize("transformer", [False, True])
def test_bench_config_builds_and_steps(transformer):
    sps = bench.bench_jax(steps=2, warmup=1, dtype="bf16", n_chains=4,
                          fused_cnn=False, transformer=transformer)
    assert sps > 0


def test_bench_mnist_config_builds_and_steps():
    """The MNIST PPDE-PAS-10 PoE config (round-5 addition: the MNIST
    domain previously had no BENCH-tracked metric) must build from the
    committed EBM/regressor checkpoints and step."""
    if not os.path.exists(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "weights", "mnist_models", "ensemble_0_ckpt_25000.pt")):
        pytest.skip("reference mnist checkpoints not linked")
    sps = bench.bench_mnist(steps=2, warmup=1, n_chains=4)
    assert sps > 0
