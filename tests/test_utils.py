import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import codec, utils


def make_pop():
    wt = codec.seqs_to_onehot(["ACDE"])[0]  # [4,20]
    pop = np.repeat(wt[None], 3, axis=0)
    # chain 1: one mutation at position 2 (D->Y)
    pop[1, 2] = 0
    pop[1, 2, 19] = 1
    # chain 2: two mutations (0: A->C, 3: E->W)
    pop[2, 0] = 0
    pop[2, 0, 1] = 1
    pop[2, 3] = 0
    pop[2, 3, 18] = 1
    return jnp.asarray(pop), jnp.asarray(wt)


def test_mut_distance():
    pop, wt = make_pop()
    np.testing.assert_array_equal(utils.mut_distance(pop, wt), [0, 1, 2])


def test_revert_only_mask():
    pop, wt = make_pop()
    allowed = utils.revert_only_mask(pop, wt)
    # chain 0 (== wt): nothing to revert
    assert not bool(allowed[0].any())
    # chain 1: exactly the wt entry at the mutated position
    assert int(allowed[1].sum()) == 1
    assert bool(allowed[1, 2, codec.AA_TO_INT["D"]])
    # chain 2: both wt entries of its two mutated positions
    assert int(allowed[2].sum()) == 2


def test_apply_proposal_masks_budget():
    pop, wt = make_pop()
    logits = jnp.zeros((3, 4 * 20))
    window = utils.position_window_mask(4, 20, 0, 3)
    masked = utils.apply_proposal_masks(logits, pop, wt, window, nmut_threshold=2)
    # chain 0 and 1 are under budget: everything in window stays finite
    assert bool(jnp.all(masked[0] == 0.0))
    assert bool(jnp.all(masked[1] == 0.0))
    # chain 2 is at budget: only its two revert entries stay finite
    finite = masked[2] > utils.NEG_INF / 2
    assert int(finite.sum()) == 2


def test_apply_proposal_masks_window():
    pop, wt = make_pop()
    logits = jnp.zeros((3, 4 * 20))
    window = utils.position_window_mask(4, 20, 1, 2)
    masked = utils.apply_proposal_masks(logits, pop, wt, window, nmut_threshold=10)
    m = masked.reshape(3, 4, 20)
    assert bool(jnp.all(m[:, 0] <= utils.NEG_INF / 2))
    assert bool(jnp.all(m[:, 3] <= utils.NEG_INF / 2))
    assert bool(jnp.all(m[:, 1:3] == 0.0))


def test_substitute_matches_dense_update():
    pop, wt = make_pop()
    # substitute chain-wise: pos 1 -> 'G' (idx 5) i.e. flat index 1*20+5
    idx = jnp.array([25, 25, 25])
    out = utils.substitute(pop, idx)
    assert codec.onehot_to_seqs(np.asarray(out))[0] == "AGDE"
    # one-hot structure preserved
    np.testing.assert_array_equal(np.asarray(out.sum(-1)), np.ones((3, 4)))


def test_categorical_onehot_distribution():
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]]))
    logits = jnp.repeat(logits, 4000, axis=0)
    idx, logp = utils.categorical_onehot(key, logits)
    freq = np.bincount(np.asarray(idx), minlength=3) / 4000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.03)
    np.testing.assert_allclose(
        np.asarray(logp), np.log([0.7, 0.2, 0.1])[np.asarray(idx)], rtol=1e-3
    )


def test_categorical_respects_neg_inf():
    key = jax.random.PRNGKey(1)
    logits = jnp.full((64, 8), utils.NEG_INF)
    logits = logits.at[:, 3].set(0.0)
    idx, logp = utils.categorical_onehot(key, logits)
    assert bool(jnp.all(idx == 3))
    np.testing.assert_allclose(np.asarray(logp), 0.0, atol=1e-5)


def test_n_hops():
    pop, wt = make_pop()
    mean, std = utils.n_hops(pop, wt)
    np.testing.assert_allclose(float(mean), 1.0)
    np.testing.assert_allclose(float(std), 1.0)
