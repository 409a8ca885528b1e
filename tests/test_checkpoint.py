import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import codec, energy as energy_mod
from ppde_tpu.models import cnn, potts
from ppde_tpu.samplers.protein import ppde

WT = "ACDEFGHIKLMNPQRSTVWY"


def make():
    pp = potts.synthetic(WT, min_pos=2, max_pos=17, seed=0)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    en = energy_mod.protein_poe(pp, ens, 1.0, wt_oh)
    oracle = (pp, lambda p, x: potts.score(p, x, delta=True))
    pop = jnp.repeat(wt_oh, 8, axis=0)
    return en, oracle, pop


def run(n_steps, ckpt_dir=None):
    en, oracle, pop = make()
    return ppde.run(en, pop, n_steps, 2, 17, oracle=oracle,
                    cfg=ppde.PPDEConfig(pas_length=2),
                    key=jax.random.PRNGKey(11), log_every=20, quiet=True,
                    checkpoint_dir=ckpt_dir)


def test_resume_is_bit_exact(tmp_path):
    """Interrupting after 40/80 steps and resuming must reproduce the
    uninterrupted run exactly (state, key, histories)."""
    ref = run(80)

    ck = str(tmp_path / "ck")
    partial = run(40, ckpt_dir=ck)  # writes checkpoints every segment
    resumed = run(80, ckpt_dir=ck)  # resumes at step 40

    np.testing.assert_array_equal(resumed.final_x, ref.final_x)
    np.testing.assert_array_equal(resumed.energy_history, ref.energy_history)
    np.testing.assert_array_equal(resumed.best_x, ref.best_x)
    np.testing.assert_array_equal(resumed.oracle_history, ref.oracle_history)
    # the resumed run only executed the remaining 40 steps
    assert partial.energy_history.shape == (41, 8)
    assert resumed.energy_history.shape == (81, 8)


def test_checkpoint_roundtrip_structures(tmp_path):
    from ppde_tpu import checkpoint as ckpt

    state = {"a": jnp.arange(4.0), "b": (jnp.zeros((2, 2)), jnp.ones(3))}
    key = jax.random.PRNGKey(5)
    ckpt.save(str(tmp_path), state, key, 17,
              {"energy": np.ones((3, 2)), "oracle": np.zeros((1, 2))})
    assert ckpt.exists(str(tmp_path))
    s2, k2, done, rec = ckpt.load(str(tmp_path), state)
    assert done == 17
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(key))
    np.testing.assert_array_equal(np.asarray(s2["a"]), np.arange(4.0))
    np.testing.assert_array_equal(rec["energy"], np.ones((3, 2)))


def test_load_rejects_config_mismatch(tmp_path):
    """A changed run config with the SAME leaf count must fail at load time
    with an error naming the offending leaf — not later inside jit."""
    import pytest

    from ppde_tpu import checkpoint as ckpt

    state = {"a": jnp.arange(4.0), "b": jnp.zeros((2, 3))}
    ckpt.save(str(tmp_path), state, jax.random.PRNGKey(0), 5, None)

    # same leaf count, different shape on 'b'
    with pytest.raises(ValueError, match=r"\['b'\].*shape"):
        ckpt.load(str(tmp_path), {"a": jnp.arange(4.0),
                                  "b": jnp.zeros((3, 3))})
    # same shapes, different dtype on 'a'
    with pytest.raises(ValueError, match=r"\['a'\].*dtype"):
        ckpt.load(str(tmp_path), {"a": jnp.arange(4),
                                  "b": jnp.zeros((2, 3))})
    # different leaf count
    with pytest.raises(ValueError, match="leaves"):
        ckpt.load(str(tmp_path), {"a": jnp.arange(4.0)})
    # matching config still loads
    s2, _, done, _ = ckpt.load(str(tmp_path), state)
    assert done == 5
    np.testing.assert_array_equal(np.asarray(s2["b"]), np.zeros((2, 3)))


def test_records_scalars_roundtrip_and_object_rejected(tmp_path):
    """Scalar record values persist (as 0-d arrays) and load back as python
    scalars; un-serializable values fail at save time naming the key."""
    import pytest

    from ppde_tpu import checkpoint as ckpt

    state = {"a": jnp.arange(3.0)}
    ckpt.save(str(tmp_path), state, jax.random.PRNGKey(0), 7,
              {"energy": np.ones((4, 2)), "steps_per_sec": 123.4,
               "n_levels": 8})
    _, _, _, rec = ckpt.load(str(tmp_path), state)
    assert rec["steps_per_sec"] == 123.4 and isinstance(
        rec["steps_per_sec"], float)
    assert rec["n_levels"] == 8
    np.testing.assert_array_equal(rec["energy"], np.ones((4, 2)))

    with pytest.raises(TypeError, match="'bad_key'"):
        ckpt.save(str(tmp_path), state, jax.random.PRNGKey(0), 7,
                  {"bad_key": object()})


def test_records_validation_names_offending_key():
    import pytest

    from ppde_tpu import checkpoint as ckpt

    prior = {"energy": np.ones((10, 4)), "traj": np.zeros((10, 7), np.int8),
             "steps_per_sec": 5.0}
    fresh = {"energy": np.ones((5, 4)), "traj": np.zeros((5, 7), np.int8)}
    ckpt.validate_records(prior, fresh)  # compatible: no raise

    with pytest.raises(ValueError, match=r"\['traj'\].*no longer produces"):
        ckpt.validate_records(prior, {"energy": np.ones((5, 4))})
    with pytest.raises(ValueError, match=r"\['extra'\].*absent"):
        ckpt.validate_records(prior, dict(fresh, extra=np.ones((5, 2))))
    with pytest.raises(ValueError, match="'energy'.*per-step shape"):
        ckpt.validate_records(prior, {"energy": np.ones((5, 8)),
                                      "traj": fresh["traj"]})


def test_load_rejects_corrupt_records_file(tmp_path):
    import pytest

    from ppde_tpu import checkpoint as ckpt

    state = {"a": jnp.arange(3.0)}
    ckpt.save(str(tmp_path), state, jax.random.PRNGKey(0), 7,
              {"energy": np.ones((4, 2))})
    with open(tmp_path / "records.npz", "wb") as f:
        f.write(b"not an npz")
    with pytest.raises(ValueError, match="records.*unreadable"):
        ckpt.load(str(tmp_path), state)


def test_load_rejects_corrupt_records_member(tmp_path):
    """np.load of an .npz is lazy — a zip with an intact directory but a
    garbled member only fails at extraction, which must still surface as
    the friendly 'unreadable, delete it' ValueError, not a raw zlib/npy
    parse error."""
    import zipfile

    import pytest

    from ppde_tpu import checkpoint as ckpt

    state = {"a": jnp.arange(3.0)}
    ckpt.save(str(tmp_path), state, jax.random.PRNGKey(0), 7,
              {"energy": np.ones((4, 2))})
    # valid zip, invalid npy payload: header open succeeds, rz[k] raises
    with zipfile.ZipFile(tmp_path / "records.npz", "w") as z:
        z.writestr("energy.npy", b"garbage, not an npy stream")
    with pytest.raises(ValueError, match="records.*unreadable"):
        ckpt.load(str(tmp_path), state)


def test_resume_with_changed_record_shape_fails_named(tmp_path):
    """End-to-end: a run resumed with a different chain count must fail with
    the named-key record error, not an opaque concat crash."""
    import pytest

    from ppde_tpu.samplers import base

    def make_step(width):
        def step(ctx, s, key):
            s = s + ctx["inc"]
            return s, {"energy": s[:width]}
        return step

    def run(width, n, ckpt_dir):
        return base.run_segmented(
            step_fn=make_step(width), ctx={"inc": jnp.ones(8)},
            init_state=jnp.zeros(8), key=jax.random.PRNGKey(0),
            num_steps=n, log_every=10, oracle_fn=None, quiet=True,
            checkpoint_dir=ckpt_dir)

    ck = str(tmp_path / "ck")
    run(8, 20, ck)
    with pytest.raises(ValueError, match="'energy'.*per-step shape"):
        run(4, 40, ck)


def test_segmented_runner_records_shapes():
    """run_segmented plumbing: records concat across segments, oracle at
    boundaries, steps_per_sec present."""
    import jax.numpy as jnp

    from ppde_tpu.samplers import base

    def step(ctx, s, key):
        s = s + ctx["inc"]
        return s, {"energy": s, "fitness": s * 2}

    state, rec = base.run_segmented(
        step_fn=step, ctx={"inc": jnp.ones(4)},
        init_state=jnp.zeros(4), key=jax.random.PRNGKey(0),
        num_steps=25, log_every=10,
        oracle_fn=lambda c, s: s + 100.0, quiet=True)
    assert rec["energy"].shape == (25, 4)
    assert rec["oracle"].shape == (4, 4)  # initial + 3 segment boundaries
    assert rec["steps_per_sec"] > 0
    np.testing.assert_allclose(np.asarray(state), 25.0)
    np.testing.assert_allclose(rec["oracle"][-1], 125.0)
