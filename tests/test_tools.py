"""tools/tpu_run.sh behavior: real failures surface immediately with the
real exit code; only TPU claim/tunnel signatures are retried."""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "tpu_run.sh")
# keep the child off the TPU tunnel and fast
ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
       "TPU_RUN_RETRY_DELAY": "0"}


def run(pyfile):
    t0 = time.perf_counter()
    p = subprocess.run(["bash", SCRIPT, pyfile], env=ENV,
                       capture_output=True, text=True, timeout=120)
    return p, time.perf_counter() - t0


def test_deterministic_crash_is_not_retried(tmp_path):
    f = tmp_path / "crash.py"
    f.write_text("raise ValueError('deliberate crash')\n")
    p, dt = run(str(f))
    assert p.returncode == 1
    assert "deliberate crash" in p.stdout + p.stderr
    assert "not retrying" in p.stderr
    assert "retrying" not in p.stdout  # no retry loop
    assert dt < 30  # no 5x15s retry sleep


def test_nonzero_exit_code_is_preserved(tmp_path):
    f = tmp_path / "exit3.py"
    f.write_text("import sys; sys.exit(3)\n")
    p, _ = run(str(f))
    assert p.returncode == 3


def test_claim_signature_is_retried(tmp_path):
    # a script that fails with a claim-race signature twice, then succeeds
    marker = tmp_path / "attempts"
    f = tmp_path / "claimy.py"
    f.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        "if n < 2:\n"
        "    sys.stderr.write('RuntimeError: axon_ifrt_start_interposer: "
        "claim timed out\\n')\n"
        "    sys.exit(1)\n"
        "print('made it')\n")
    p, _ = run(str(f))
    assert p.returncode == 0
    assert "made it" in p.stdout
    assert marker.read_text() == "3"
    assert p.stderr.count("retrying") == 2


def test_success_passes_through(tmp_path):
    f = tmp_path / "ok.py"
    f.write_text("print('hello from tpu_run')\n")
    p, _ = run(str(f))
    assert p.returncode == 0
    assert "hello from tpu_run" in p.stdout


def test_stdout_stays_clean_of_stderr(tmp_path):
    """bench.py's one-JSON-line stdout contract: warnings/tracebacks on
    stderr must NOT interleave into stdout (| jq consumers)."""
    f = tmp_path / "noisy.py"
    f.write_text(
        "import sys\n"
        "sys.stderr.write('WARNING: spurious platform chatter\\n')\n"
        "print('{\"metric\": \"x\", \"value\": 1}')\n")
    p, _ = run(str(f))
    assert p.returncode == 0
    assert p.stdout.strip() == '{"metric": "x", "value": 1}'
    assert "chatter" in p.stderr


def test_plain_word_claim_in_crash_is_not_retried(tmp_path):
    """An app-level assertion that merely contains the word 'claim' is a
    real failure, not a TPU claim race."""
    f = tmp_path / "claimword.py"
    f.write_text(
        "raise AssertionError('checkpoint claims 3 members, got 4')\n")
    p, dt = run(str(f))
    assert p.returncode == 1
    assert "not retrying" in p.stderr
    assert dt < 30


def test_remote_compile_drop_is_retried(tmp_path):
    """A mid-compile tunnel drop (round-4 failure mode: the timed-scan
    compile died with 'response body closed') must be retried — the client
    process has already exited, so relaunching is claim-safe."""
    f = tmp_path / "tunnel.py"
    f.write_text(
        "import sys\n"
        "sys.stderr.write('jax.errors.JaxRuntimeError: INTERNAL: "
        "http://127.0.0.1:8093/remote_compile: read body: response body "
        "closed before all bytes were read\\n')\n"
        "sys.exit(1)\n")
    p, _ = run(str(f))
    assert "retrying" in p.stderr
    assert "giving up after 5" in p.stderr


def test_render_parity_tables(tmp_path):
    """Cell-summary JSON -> markdown row with a sources line (the PARITY
    evidence chain's render direction)."""
    import json
    import subprocess

    d = tmp_path / "sums"
    d.mkdir()
    (d / "P_PPDE_s7.json").write_text(json.dumps(
        {"protein": "PABP", "sampler": "PPDE", "seed": 7,
         "run_signature": "potts_exact", "diversity_pct": 93.0,
         "exploration_mean": 7.1, "exploration_std": 2.0,
         "oracle_logfit": {"p50": 1.1, "p100": 2.2},
         "steps_per_sec": 800.0}))
    # non-cell JSONs alongside must be skipped, not crash the render
    (d / "corr.json").write_text(json.dumps({"spearman": 0.5}))
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "render_parity_tables.py"),
         "--summaries", str(d), "--mnist"],
        env=ENV, capture_output=True, text=True, timeout=60)
    assert p.returncode == 0
    assert "| PPDE/potts_exact/s7 | 93.0 | 7.10 ± 2.00 | 1.10 (2.20) | — | 800.0 |" in p.stdout
    assert "P_PPDE_s7.json" in p.stdout


def test_render_parity_seed_spread(tmp_path):
    """--seed_spread aggregates cells differing only in seed into
    mean ± half-range rows; singleton groups are omitted."""
    import json
    import subprocess

    d = tmp_path / "sums"
    d.mkdir()
    for seed, div, p50, p100 in ((7, 90.0, 1.0, 3.0), (42, 94.0, 1.4, 5.0)):
        (d / f"P_PPDE_s{seed}.json").write_text(json.dumps(
            {"protein": "PABP", "sampler": "PPDE", "seed": seed,
             "run_signature": "fam", "diversity_pct": div,
             "exploration_mean": 5.0, "exploration_std": 1.0,
             "oracle_logfit": {"p50": p50, "p100": p100},
             "steps_per_sec": 800.0}))
    # a singleton group (different signature) must not produce a row
    (d / "P_SA_s7.json").write_text(json.dumps(
        {"protein": "PABP", "sampler": "SA", "seed": 7,
         "run_signature": "solo", "diversity_pct": 50.0,
         "exploration_mean": 2.0, "exploration_std": 1.0,
         "oracle_logfit": {"p50": 0.1, "p100": 0.2},
         "steps_per_sec": 100.0}))
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "render_parity_tables.py"),
         "--summaries", str(d), "--mnist", "--seed_spread"],
        env=ENV, capture_output=True, text=True, timeout=60)
    assert p.returncode == 0
    assert ("| PPDE/fam (n=2) | 92.00 ± 2.00 | 5.00 ± 0.00 | 1.20 ± 0.20 |"
            " 4.00 ± 1.00 |") in p.stdout
    assert "SA/solo" not in p.stdout
    assert "P_PPDE_s7.json" in p.stdout

def _spread_cell(d, seed, *, n_iters=10000, path=None):
    import json
    (path or (d / f"P_PPDE_s{seed}.json")).write_text(json.dumps(
        {"protein": "PABP", "sampler": "PPDE", "seed": seed,
         "run_signature": "fam", "diversity_pct": 90.0,
         "exploration_mean": 5.0, "exploration_std": 1.0,
         "n_iters": n_iters, "n_chains": 128,
         "oracle_logfit": {"p50": 1.0, "p100": 3.0},
         "steps_per_sec": 800.0}))


def test_render_parity_seed_spread_refuses_config_mixes(tmp_path):
    """A 'seed spread' over cells that differ in n_iters (or that duplicate
    a seed across two summaries dirs) must be a hard error, not a silent
    average no single configuration produced."""
    import subprocess

    d = tmp_path / "sums"
    d.mkdir()
    _spread_cell(d, 7)
    _spread_cell(d, 42, n_iters=1000)  # config mix
    cmd = [sys.executable, os.path.join(REPO, "tools",
                                        "render_parity_tables.py"),
           "--summaries", str(d), "--mnist", "--seed_spread"]
    p = subprocess.run(cmd, env=ENV, capture_output=True, text=True,
                       timeout=60)
    assert p.returncode != 0
    assert "disagree on n_iters" in p.stderr

    _spread_cell(d, 42)  # fix the mix...
    d2 = tmp_path / "sums2"
    d2.mkdir()
    _spread_cell(d2, 42, path=d2 / "dup.json")  # ...but duplicate a seed
    p = subprocess.run(cmd[:-2] + [str(d2), "--mnist", "--seed_spread"],
                       env=ENV, capture_output=True, text=True, timeout=60)
    assert p.returncode != 0
    assert "duplicate seeds" in p.stderr

    p = subprocess.run(cmd, env=ENV, capture_output=True, text=True,
                       timeout=60)  # clean pair renders fine
    assert p.returncode == 0 and "(n=2)" in p.stdout
