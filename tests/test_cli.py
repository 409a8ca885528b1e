"""CLI end-to-end tests: reference flag surface + artifact contract."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_weights_overlay():
    link = os.path.join(REPO, "weights", "PABP_YEAST_Fields2013",
                        "onehot_cnn_seed=0.pt")
    if not os.path.exists(link):
        subprocess.run([os.path.join(REPO, "tools",
                                     "link_reference_weights.sh"), REFERENCE],
                       check=True, capture_output=True)


def test_parser_defaults_match_reference():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib

    de = importlib.import_module("directed_evolution")
    args = de.build_parser().parse_args([])
    # reference defaults (scripts/directed_evolution.py:113-165)
    assert args.seed == 1234567
    assert args.n_chains == 128
    assert args.n_iters == 10000
    assert args.energy_lamda == 5
    assert args.sampler == "PPDE"
    assert args.unsupervised_expert == "potts"
    assert args.nmut_threshold == 0
    assert args.ppde_pas_length == 2
    assert args.simulated_annealing_temp == 0.01
    assert args.muts_per_seq_param == 1.5
    assert args.decay_rate == 0.999
    assert args.diffusion_step_size == 0.1
    assert args.diffusion_relaxation_tau == 0.99
    assert args.cmaes_population_size == 16
    assert args.cmaes_initial_variance == 0.05

    ms = importlib.import_module("mnist_sum")
    margs = ms.build_parser().parse_args([])
    # reference defaults (scripts/mnist_sum.py:143-178)
    assert margs.n_chains == 128
    assert margs.energy_lamda == 10
    assert margs.unsupervised_expert == "ebm"
    assert margs.ppde_pas_length == 10
    assert margs.simulated_annealing_temp == 10
    assert margs.muts_per_seq_param == 5
    assert margs.diffusion_step_size == 0.01
    assert margs.cmaes_initial_variance == 0.1


@requires_reference
def test_directed_evolution_end_to_end(tmp_path):
    """Tiny full CLI run on UBE4B with real artifacts -> artifact contract."""
    _ensure_weights_overlay()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib

    de = importlib.import_module("directed_evolution")
    args = de.build_parser().parse_args([
        "--protein", "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio",
        "--protein_weights", os.path.join(REPO, "weights"),
        "--results_path", str(tmp_path),
        "--n_iters", "10", "--n_chains", "4", "--log_every", "5",
        "--nmut_threshold", "10", "--energy_lamda", "0.5",
        "--disable_MSA_transformer_scoring", "--run_signature", "test",
    ])
    run_dir = de.main(args)

    expected = ["config.txt", "population.npy", "pred_fitness_scores.npy",
                "oracle_fitness_scores.npy", "potts_scores.npy",
                "energy_scores.npy", "energy_history.npy",
                "fitness_history.npy", "summary.json"]
    for f in expected:
        assert (run_dir / f).exists(), f
    cfg = json.loads((run_dir / "config.txt").read_text())
    assert cfg["n_iters"] == 10
    pop = np.load(run_dir / "population.npy")
    assert pop.shape == (4, 104, 20)
    np.testing.assert_array_equal(pop.sum(-1), 1.0)
    assert np.load(run_dir / "energy_history.npy").shape == (11, 4)
    # machine-readable cell summary: the PARITY.md evidence contract
    s = json.loads((run_dir / "summary.json").read_text())
    for k in ("diversity_pct", "exploration_mean", "oracle_logfit",
              "potts_provenance", "steps_per_sec", "reference_reverse"):
        assert k in s, k
    assert s["potts_provenance"] == "refit"  # UBE4B has a committed npz
    assert 0.0 <= s["diversity_pct"] <= 100.0
    assert s["oracle_logfit"]["p50"] <= s["oracle_logfit"]["p100"]


@requires_reference
def test_mnist_sum_end_to_end(tmp_path):
    _ensure_weights_overlay()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib

    ms = importlib.import_module("mnist_sum")
    args = ms.build_parser().parse_args([
        "--mnist_weights", os.path.join(REPO, "weights", "mnist_models"),
        "--data_dir", os.path.join(REPO, "data", "mnist"),
        "--results_path", str(tmp_path),
        "--sampler", "PPDE", "--energy_function", "supervised",
        "--n_iters", "8", "--n_chains", "4", "--log_every", "4",
        "--ppde_pas_length", "2", "--wild_type", "0",
        "--metrics", "viz+csv",
    ])
    res = ms.main(args)
    assert res.final_x.shape == (4, 784)
    files = os.listdir(tmp_path)
    assert any(f.endswith("_final_population.npy") for f in files)
    assert any(f.endswith("_pred_sums.csv") for f in files)


@requires_reference
def test_directed_evolution_ppde_pt_end_to_end(tmp_path):
    """CLI dispatch of the beyond-reference PPDE-PT sampler (protein)."""
    _ensure_weights_overlay()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib

    de = importlib.import_module("directed_evolution")
    args = de.build_parser().parse_args([
        "--protein", "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio",
        "--protein_weights", os.path.join(REPO, "weights"),
        "--results_path", str(tmp_path),
        "--sampler", "PPDE-PT", "--pt_levels", "4", "--pt_beta_min", "0.3",
        "--n_iters", "8", "--n_chains", "8", "--log_every", "4",
        "--nmut_threshold", "10", "--energy_lamda", "0.5",
        "--disable_MSA_transformer_scoring", "--run_signature", "test",
    ])
    run_dir = de.main(args)
    pop = np.load(run_dir / "population.npy")
    assert pop.shape == (8, 104, 20)
    np.testing.assert_array_equal(pop.sum(-1), 1.0)
    assert np.load(run_dir / "energy_history.npy").shape == (9, 8)


@requires_reference
def test_mnist_sum_ppde_pt_end_to_end(tmp_path):
    """CLI dispatch of the beyond-reference PPDE-PT sampler (MNIST)."""
    _ensure_weights_overlay()
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib

    ms = importlib.import_module("mnist_sum")
    args = ms.build_parser().parse_args([
        "--mnist_weights", os.path.join(REPO, "weights", "mnist_models"),
        "--data_dir", os.path.join(REPO, "data", "mnist"),
        "--results_path", str(tmp_path),
        "--sampler", "PPDE-PT", "--pt_levels", "2",
        "--n_iters", "6", "--n_chains", "4", "--log_every", "3",
        "--ppde_pas_length", "2", "--wild_type", "0",
        "--metrics", "csv",
    ])
    res = ms.main(args)
    assert res.final_x.shape == (4, 784)
    files = os.listdir(tmp_path)
    assert any(f.startswith("PPDE-PT") and f.endswith("_pred_sums.csv")
               for f in files)


def test_resolve_esm_chunk():
    """--esm_chunk flag semantics: 0 = auto (16 only when a transformer is
    present and the population out-sizes one chunk), -1 = force monolithic,
    positive = verbatim."""
    from ppde_tpu.runtime import resolve_esm_chunk

    assert resolve_esm_chunk(0, True, 128) == 16
    assert resolve_esm_chunk(0, True, 16) is None   # fits one chunk
    assert resolve_esm_chunk(0, False, 128) is None  # no transformer
    assert resolve_esm_chunk(-1, True, 128) is None  # explicit monolithic
    assert resolve_esm_chunk(8, True, 128) == 8
    assert resolve_esm_chunk(8, False, 4) == 8


def test_r4_evidence_spec_parses():
    """Every cell in the batched round-4 evidence grid must parse under the
    CLI parser, carry a summary_json matching its name, and be unique —
    the batch runner (scripts/run_cells.py) and the per-process driver
    (scripts/run_r4_evidence.sh) must describe the same grid shape:
    3 proteins x (4 exact + 4 refrev seeds + SA/Random/MALA + CMAES +
    2 ablations + PT) = 45."""
    from scripts import directed_evolution as de
    from scripts import run_cells

    cells = run_cells.r4_evidence_spec()
    assert len(cells) == 45
    names = [c["name"] for c in cells]
    assert len(set(names)) == 45
    parser = de.build_parser()
    for c in cells:
        ns = parser.parse_args(c["argv"])
        assert ns.summary_json.endswith(c["name"] + ".json")
        assert ns.disable_MSA_transformer_scoring
        assert ns.n_chains == 128


def test_r4_mnist_extras_spec_parses():
    """Every cell in the round-4 MNIST extras grid must parse under the
    MNIST CLI parser, route through module 'mnist', and name a done_file
    consistent with scripts/mnist_sum.py's artifact naming
    ({abbrv}_{energy_function}_{suffix}_final_population.npy): the
    ablation trio (EBM/DAE PoE + supervised-only) + 4 wild-type pairs x
    PPDE/SA/MALA + CMA-ES on pair 0 = 16."""
    from scripts import mnist_sum as ms
    from scripts import run_cells

    cells = run_cells.r4_mnist_extras_spec()
    assert len(cells) == 16
    names = [c["name"] for c in cells]
    assert len(set(names)) == 16
    parser = ms.build_parser()
    abbrv = {"PPDE": "PPDE-PAS-10", "simulated_annealing": "SA",
             "MALA-approx": "MALA-approx", "CMAES": "CMAES"}
    for c in cells:
        assert c["module"] == "mnist"
        ns = parser.parse_args(c["argv"])
        expect = f"{abbrv[ns.sampler]}_{ns.energy_function}_{ns.suffix}"
        assert c["name"] == expect, (c["name"], expect)
        assert c["done_file"] == (
            f"results/mnist/{expect}_final_population.npy")
        assert ns.n_chains == 128


@requires_reference
def test_run_cells_executes_mixed_grid_and_skips_done(tmp_path, capsys):
    """run_cells end-to-end: a mixed de+mnist spec runs both cells under one
    process, then a re-run skips them (summary_json for de, done_file for
    mnist)."""
    _ensure_weights_overlay()
    import json as _json

    from scripts import run_cells

    de_summary = tmp_path / "de_summary.json"
    mnist_done = tmp_path / ("PPDE-PAS-2_supervised_t_final_population"
                             ".npy")
    spec = [
        {"name": "de_tiny", "argv": [
            "--protein", "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio",
            "--protein_weights", os.path.join(REPO, "weights"),
            "--results_path", str(tmp_path),
            "--n_iters", "6", "--n_chains", "4", "--log_every", "3",
            "--nmut_threshold", "10", "--energy_lamda", "0.5",
            "--disable_MSA_transformer_scoring", "--run_signature", "t",
            "--summary_json", str(de_summary)]},
        {"name": "PPDE-PAS-2_supervised_t", "module": "mnist",
         "done_file": str(mnist_done), "argv": [
            "--mnist_weights", os.path.join(REPO, "weights",
                                            "mnist_models"),
            "--data_dir", os.path.join(REPO, "data", "mnist"),
            "--results_path", str(tmp_path),
            "--sampler", "PPDE", "--energy_function", "supervised",
            "--n_iters", "4", "--n_chains", "4", "--log_every", "2",
            "--ppde_pas_length", "2", "--wild_type", "0",
            "--suffix", "t", "--metrics", "viz"]},
    ]
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(_json.dumps(spec))

    run_cells.main(["--spec", str(spec_path)])
    assert _json.loads(de_summary.read_text())["diversity_pct"] >= 0
    assert mnist_done.exists()
    assert "done=2 skipped=0 failed=0" in capsys.readouterr().out

    run_cells.main(["--spec", str(spec_path)])  # idempotent re-run
    assert "done=0 skipped=2 failed=0" in capsys.readouterr().out

def test_run_cells_write_placeholders_skips_summaryless_cells(tmp_path,
                                                              capsys):
    """--write_placeholders must skip done_file/mnist cells (no
    --summary_json to placeholder) instead of crashing, and must create
    missing parent directories for spec summary paths."""
    import json as _json

    from scripts import run_cells

    deep = tmp_path / "not" / "yet" / "made" / "cell.json"
    spec = [
        {"name": "mnist_cell", "module": "mnist",
         "done_file": str(tmp_path / "nope.npy"), "argv": ["--n_iters", "4"]},
        {"name": "no_summary_de", "argv": ["--n_iters", "4"]},
        {"name": "deep_de", "argv": ["--summary_json", str(deep)]},
    ]
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(_json.dumps(spec))
    run_cells.main(["--spec", str(spec_path), "--write_placeholders"])
    out = capsys.readouterr().out
    assert "wrote 1 placeholders (2 cells have no summary path)" in out
    assert deep.read_text() == "{}"
    # the builtin mnist grid (all done_file cells) must not crash either
    run_cells.main(["--r4_mnist_extras", "--write_placeholders"])
    assert "wrote 0 placeholders" in capsys.readouterr().out


def test_run_cells_contains_systemexit_from_bad_argv(tmp_path, capsys):
    """A malformed cell argv (argparse sys.exit(2)) must fail THAT cell and
    keep the batch queue running, not abort the whole process."""
    import json as _json

    import pytest

    from scripts import run_cells

    good = tmp_path / "good.json"
    spec = [
        {"name": "bad_flag", "argv": [
            "--no_such_flag", "--summary_json", str(tmp_path / "bad.json")]},
        # a second malformed cell proves the queue continued past the first
        {"name": "bad_flag2", "argv": [
            "--no_such_flag2", "--summary_json", str(good)]},
    ]
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(_json.dumps(spec))
    with pytest.raises(SystemExit):  # exits 1 AFTER the full queue ran
        run_cells.main(["--spec", str(spec_path)])
    out = capsys.readouterr().out
    assert "FAILED (exit 2): bad_flag" in out
    assert "FAILED (exit 2): bad_flag2" in out
    assert "done=0 skipped=0 failed=2" in out

def test_run_cells_stop_file_drains_queue(tmp_path, capsys, monkeypatch):
    """A present stop file must make the queue exit BEFORE starting another
    cell (graceful deadline drain of the exclusive TPU claim) — no cell
    runs, no failure is recorded."""
    import json as _json

    from scripts import run_cells

    stop = tmp_path / "stop"
    stop.write_text("")
    monkeypatch.setattr(run_cells, "STOP_FILE", str(stop))
    spec = [{"name": "never_runs", "argv": [
        "--no_such_flag", "--summary_json", str(tmp_path / "s.json")]}]
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(_json.dumps(spec))
    run_cells.main(["--spec", str(spec_path)])  # must NOT raise: 0 failed
    out = capsys.readouterr().out
    assert "stop file" in out and "draining queue early" in out
    assert "done=0 skipped=0 failed=0" in out


def test_r5_family_spec_parses_and_staleness():
    """Every cell in the round-5 family grid (3 proteins x 2 experts x 4
    seeds at the canonical 10k iters) must parse under the CLI parser,
    target the SAME committed summary path as its round-4 counterpart
    (in-place upgrade), and carry expect={'n_iters': 10000} so a 2500-iter
    round-4 summary reads as 'stale' (re-run) while a full-depth one reads
    'done' (skipped on relaunch)."""
    from scripts import directed_evolution as de
    from scripts import run_cells

    cells = run_cells.r5_family_spec()
    assert len(cells) == 24
    assert len({c["name"] for c in cells}) == 24
    parser = de.build_parser()
    for c in cells:
        ns = parser.parse_args(c["argv"])
        assert ns.n_iters == 10000
        assert ns.msa_size == 500
        assert ns.summary_json == f"results/esm_family/{c['name']}.json"
        assert c["expect"] == {"n_iters": 10000}
        # summary filename and run_signature both use the '_' variant
        assert "+" not in c["name"]
        assert "+" not in ns.run_signature


def test_r5_spec_builders_parse():
    """The three round-5 evidence grids must parse under their CLI parsers
    with unique names: the 6 UBE4B scale-matched canonical cells (all
    carrying --potts_npz of the calibrated artifact), the 36 baseline
    seed-spread cells (3 proteins x [SA/Random/MALA/CMAES] x seeds
    7/42/2024, exact canonical configs), and the 3 missing MNIST CMA-ES
    wild-type pairs (canonical 20k-iter config, pairs 2-4)."""
    from scripts import directed_evolution as de
    from scripts import mnist_sum as ms
    from scripts import run_cells

    de_parser = de.build_parser()

    cells = run_cells.r5_scalematch_spec()
    assert len(cells) == len({c["name"] for c in cells}) == 6
    for c in cells:
        ns = de_parser.parse_args(c["argv"])
        assert ns.potts_npz.endswith("potts_scalematched.npz")
        assert ns.energy_lamda == 0.5 and ns.seed == 1234567
        assert "scalematch" in ns.run_signature

    cells = run_cells.r5_baseline_seeds_spec()
    assert len(cells) == len({c["name"] for c in cells}) == 36
    for c in cells:
        ns = de_parser.parse_args(c["argv"])
        assert ns.seed in (7, 42, 2024)
        assert ns.sampler != "PPDE"  # PPDE's seed spread is round-4 evidence
        assert ns.n_iters == (1000 if ns.sampler == "CMAES" else 10000)

    mnist_parser = ms.build_parser()
    cells = run_cells.r5_mnist_cmaes_spec()
    assert len(cells) == len({c["name"] for c in cells}) == 3
    for c in cells:
        assert c["module"] == "mnist"
        ns = mnist_parser.parse_args(c["argv"])
        assert ns.sampler == "CMAES" and ns.n_iters == 20000
        assert ns.wild_type in (2, 3, 4)


def test_summary_state_expect_mismatch_is_stale(tmp_path):
    """A summary that exists but disagrees with the cell's expect dict is
    'stale' (re-run); agreeing summaries are 'done'; non-dict JSON is
    'placeholder'."""
    import json as _json

    from scripts import run_cells

    path = tmp_path / "s.json"
    cell = {"name": "c", "expect": {"n_iters": 10000},
            "argv": ["--summary_json", str(path)]}
    assert run_cells.summary_state(cell) == "missing"
    path.write_text(_json.dumps({"n_iters": 2500, "diversity_pct": 1.0}))
    assert run_cells.summary_state(cell) == "stale"
    path.write_text(_json.dumps({"n_iters": 10000, "diversity_pct": 1.0}))
    assert run_cells.summary_state(cell) == "done"
    path.write_text("[1, 2]")
    assert run_cells.summary_state(cell) == "placeholder"
    # without expect, any non-placeholder content is done
    cell2 = {"name": "c2", "argv": ["--summary_json", str(path)]}
    assert run_cells.summary_state(cell2) == "done"


def test_run_cells_zero_exit_without_summary_counts_failed(tmp_path,
                                                           capsys):
    """A cell whose argv exits 0 before sampling (e.g. --help) must be
    counted FAILED when its summary never materialized — otherwise every
    relaunch of the queue re-runs it and re-reports success (advisor
    round-4 finding)."""
    import json as _json

    import pytest

    from scripts import run_cells

    spec = [{"name": "help_cell", "argv": [
        "--help", "--summary_json", str(tmp_path / "never.json")]}]
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(_json.dumps(spec))
    with pytest.raises(SystemExit):
        run_cells.main(["--spec", str(spec_path)])
    out = capsys.readouterr().out
    assert "FAILED (exit 0 but summary missing): help_cell" in out
    assert "done=0 skipped=0 failed=1" in out


def test_eval_proteins_update_refuses_stale_stable_copy(tmp_path, capsys):
    """--update_summary must never overwrite a tracked stable summary whose
    contents no longer match the run dir being evaluated (i.e. a newer run
    of the same cell owns the stable path); {} placeholders and matching
    copies are updated."""
    import json as _json

    import numpy as np

    from scripts import eval_proteins

    stable = tmp_path / "stable.json"
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    base = {"protein": "P", "sampler": "PPDE", "seed": 7,
            "diversity_pct": 50.0, "summary_json": str(stable)}
    (run_dir / "summary.json").write_text(_json.dumps(base))

    class _Args:
        msa_transformer_model = "msa-S"
        msa_transformer_weights = None
        msa_path = "x.a2m"
        msa_size = 4

    # newer run owns the stable path: different numbers there
    stable.write_text(_json.dumps(dict(base, diversity_pct=99.0)))
    eval_proteins.update_summaries(str(run_dir), np.ones(4), _Args)
    assert "SKIPPED stale stable copy" in capsys.readouterr().out
    assert _json.loads(stable.read_text())["diversity_pct"] == 99.0
    assert "evolutionary_density" in _json.loads(
        (run_dir / "summary.json").read_text())  # run-local still updated

    # a matching copy (same cell, possibly already density-scored) updates
    stable.write_text(_json.dumps(dict(base, evolutionary_density={})))
    eval_proteins.update_summaries(str(run_dir), np.ones(4), _Args)
    assert "evolutionary_density" in _json.loads(stable.read_text())
    # and a {} placeholder is fair game
    stable.write_text("{}")
    eval_proteins.update_summaries(str(run_dir), np.ones(4), _Args)
    assert _json.loads(stable.read_text())["diversity_pct"] == 50.0
