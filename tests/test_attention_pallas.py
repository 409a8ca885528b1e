"""Flash attention kernel (interpret mode): forward + gradients match the
XLA reference path exactly (same numerics: f32 scores, f32 softmax)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu.ops import attention_pallas


def xla_attention(q, k, v):
    scores = jnp.einsum("zqd,zkd->zqk", q, k)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("zqk,zkd->zqd", w, v)


def make(Z, T, hd, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: (jax.random.normal(k, (Z, T, hd)) * 0.5).astype(dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("Z,T,hd,dtype", [
    (4, 16, 8, jnp.float32),
    (6, 237, 24, jnp.float32),     # ESM2-S head shape (odd T, zb autohalve)
    (8, 64, 32, jnp.bfloat16),
])
def test_forward_matches_xla(Z, T, hd, dtype):
    q, k, v = make(Z, T, hd, dtype)
    ref = xla_attention(q, k, v)
    out = attention_pallas.flash_attention(q, k, v, 8, True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
                               atol=2e-2 if dtype == jnp.bfloat16 else 1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gradients_match_xla(dtype):
    Z, T, hd = 4, 33, 16
    q, k, v = make(Z, T, hd, dtype, seed=1)
    w = jax.random.normal(jax.random.PRNGKey(9), (Z, T, hd)).astype(dtype)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v).astype(jnp.float32) *
                       w.astype(jnp.float32))

    def loss_flash(q, k, v):
        return jnp.sum(attention_pallas.flash_attention(
            q, k, v, 8, True).astype(jnp.float32) * w.astype(jnp.float32))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    tol = dict(rtol=3e-2, atol=3e-2) if dtype == jnp.bfloat16 else \
        dict(rtol=1e-4, atol=1e-5)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   err_msg=f"d{name}", **tol)


def test_esm2_forward_flash_equals_xla():
    """End-to-end: the ESM2 PLL with the flash backend equals the XLA
    backend (f32 params, interpret-mode kernel via monkeypatched call)."""
    from ppde_tpu.models import esm2

    params = esm2.init(jax.random.PRNGKey(0), "transformer-S",
                       dtype=jnp.float32)
    # shrink: 2 layers for test speed
    params["layers"] = params["layers"][:2]
    x = jnp.asarray(esm2.seq_to_esm_onehot("ACDEFGHIKLMNPQRSTVWY" * 2))[None]

    esm2.ATTENTION_IMPL = "xla"
    try:
        ref = esm2.pseudo_log_likelihood(params, x)
        orig = attention_pallas.flash_attention

        def interp(q, k, v, zb=8, interpret=False):
            return orig(q, k, v, zb, True)

        esm2.attention_pallas.flash_attention = interp
        esm2.ATTENTION_IMPL = "flash"
        out = esm2.pseudo_log_likelihood(params, x)
    finally:
        esm2.attention_pallas.flash_attention = orig
        esm2.ATTENTION_IMPL = None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
