"""DCN sweep driver: deterministic grid, disjoint-cover partition."""
import subprocess
import sys

from scripts import sweep_dcn


def test_grid_is_deterministic():
    a = sweep_dcn.build_grid([1, 2], 100, 10)
    b = sweep_dcn.build_grid([1, 2], 100, 10)
    assert [c["name"] for c in a] == [c["name"] for c in b]
    # 3 proteins x 7 samplers (incl. beyond-reference PPDE-PT) x 2 seeds
    assert len(a) == 3 * 7 * 2
    assert len({c["name"] for c in a}) == len(a)


def test_partition_is_disjoint_cover():
    cells = sweep_dcn.build_grid([1, 2, 3], 100, 10)
    for num_hosts in (1, 2, 3, 5, 8, len(cells) + 3):
        shards = [sweep_dcn.partition(cells, h, num_hosts)
                  for h in range(num_hosts)]
        names = [c["name"] for s in shards for c in s]
        assert sorted(names) == sorted(c["name"] for c in cells)
        # balanced within 1
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1


def test_transformer_cells_gated_on_weights():
    no_w = sweep_dcn.build_grid([1], 100, 10,
                                experts=("potts", "transformer-M"))
    with_w = sweep_dcn.build_grid([1], 100, 10, esm_weights="/x.pt",
                                  experts=("potts", "transformer-M"))
    assert len(with_w) == 2 * len(no_w)
    assert any("--esm_weights" in c["argv"] for c in with_w)


def test_detect_host_env(monkeypatch):
    ns = sweep_dcn.argparse.Namespace(host_id=None, num_hosts=None)
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_NTASKS", "16")
    assert sweep_dcn.detect_host(ns) == (3, 16)
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    assert sweep_dcn.detect_host(ns) == (1, 4)  # JAX_* wins
    ns2 = sweep_dcn.argparse.Namespace(host_id=2, num_hosts=8)
    assert sweep_dcn.detect_host(ns2) == (2, 8)


def test_dry_run_cli():
    p = subprocess.run(
        [sys.executable, "scripts/sweep_dcn.py", "--dry_run",
         "--num_hosts", "4", "--host_id", "1", "--family_root", ""],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 0
    assert "host 1/4" in p.stdout
    # 21 cells (3 proteins x 7 samplers) over 4 hosts -> 5 or 6 per host
    assert "of 21 cells" in p.stdout


def _fake_family_root(tmp_path, prots, scorer_for=()):
    root = tmp_path / "fam"
    root.mkdir()
    for prot in prots:
        (root / f"{prot}_transformer-S_ckpt_4000.npz").write_bytes(b"x")
        (root / f"{prot}_transformer-S_ckpt_2000.npz").write_bytes(b"x")
        if prot in scorer_for:
            (root / f"{prot}_msat_S_ckpt_2000.npz").write_bytes(b"x")
    return str(root)


def test_family_cells_discovered_and_gridded(tmp_path):
    """Family-expert cells (run_esm_family.sh artifacts) join the grid: two
    PPDE cells per protein with a checkpoint, density scoring wired when a
    per-protein msa-S scorer + family MSA exist."""
    ube4b = "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio"
    gfp = "GFP_AEQVI_Sarkisyan2016"
    root = _fake_family_root(tmp_path, [ube4b, gfp], scorer_for=[ube4b])

    fam = sweep_dcn.discover_family(root, sweep_dcn.PROTEINS)
    assert set(fam) == {ube4b, gfp}
    # the highest-step checkpoint wins
    assert fam[ube4b]["ckpt"].endswith("_ckpt_4000.npz")
    assert fam[ube4b]["scorer"] and fam[ube4b]["scorer"].endswith(
        "_msat_S_ckpt_2000.npz")
    # UBE4B's real MSA is committed, so discover_family must find it
    assert fam[ube4b]["msa"] and fam[ube4b]["msa"].endswith(
        "UBE4B_MOUSE.a2m")

    base = sweep_dcn.build_grid([1], 100, 10)
    cells = sweep_dcn.build_grid([1], 100, 10, family=fam)
    extra = [c for c in cells if "/family/" in c["name"]]
    assert len(cells) == len(base) + len(extra) and len(extra) == 4
    names = {c["name"] for c in extra}
    assert f"{ube4b}/family/potts+transformer-S/s1" in names
    assert f"{gfp}/family/transformer-S/s1" in names
    # density scoring rides the per-protein scorer where it exists
    by_prot = {c["name"]: c["argv"] for c in extra}
    assert "--msa_transformer_weights" in by_prot[
        f"{ube4b}/family/transformer-S/s1"]
    if fam[gfp]["scorer"] is None:
        assert "--msa_transformer_weights" not in by_prot[
            f"{gfp}/family/transformer-S/s1"]
    # still a deterministic disjoint cover with family cells present
    shards = [sweep_dcn.partition(cells, h, 3) for h in range(3)]
    assert sorted(c["name"] for s in shards for c in s) == sorted(
        c["name"] for c in cells)

def test_family_run_signature_matches_committed_evidence(tmp_path):
    """The family cells' run_signature must use '_' (never '+') so the
    evidence identity matches run_r4_family_cells.sh and the committed
    results/esm_family/*_family_*.json cells — render_parity_tables
    groups seed spreads by run_signature, so a '+' variant would split
    one cell into two rows."""
    ube4b = "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio"
    root = _fake_family_root(tmp_path, [ube4b])
    fam = sweep_dcn.discover_family(root, sweep_dcn.PROTEINS)
    cells = sweep_dcn.build_grid([1], 100, 10, family=fam)
    sigs = {c["argv"][c["argv"].index("--run_signature") + 1]
            for c in cells if "/family/" in c["name"]}
    assert sigs == {"potts_transformer-S_family", "transformer-S_family"}
    assert not any("+" in s for s in sigs)


def test_family_shell_scripts_use_underscore_signature():
    """Same invariant for the SHELL drivers (round-4 advisor): a script
    passing --run_signature "potts+<model>_family" would silently split a
    seed-spread group into two renderer rows."""
    import pathlib
    import re

    scripts = pathlib.Path(__file__).resolve().parents[1] / "scripts"
    for sh in scripts.glob("*.sh"):
        text = sh.read_text()
        for m in re.finditer(r'--run_signature\s+"([^"]*)"', text):
            sig = m.group(1)
            # literal '+' only; shell expansions like $(tr '+' '_') are fine
            assert "+" not in re.sub(r"\$\([^)]*\)|\$\{[^}]*\}", "", sig), \
                f"{sh.name}: run_signature {sig!r} uses the '+' variant"


def test_discover_family_tolerates_noninteger_ckpt_suffixes(tmp_path):
    """Stray files the *_ckpt_*.npz glob matches but whose step suffix is
    not a bare integer (ckpt_final.npz, ckpt_4000_best.npz) must be
    ignored, not crash the driver at startup."""
    ube4b = "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio"
    root = _fake_family_root(tmp_path, [ube4b])
    import os
    for stray in (f"{ube4b}_transformer-S_ckpt_final.npz",
                  f"{ube4b}_transformer-S_ckpt_4000_best.npz",
                  f"{ube4b}_msat_S_ckpt_best.npz"):
        with open(os.path.join(root, stray), "wb") as f:
            f.write(b"x")
    fam = sweep_dcn.discover_family(root, sweep_dcn.PROTEINS)
    assert fam[ube4b]["ckpt"].endswith("_ckpt_4000.npz")


def test_lambda_table_is_single_sourced():
    """run_cells' evidence grid and the shell drivers must carry the same
    calibrated lambdas as sweep_dcn.LAMBDA (the single source of truth);
    recalibrating a protein in one copy silently forked the grids before
    round 4's review."""
    import os
    import re

    from scripts import run_cells

    for prot in run_cells.PROTEINS:
        assert float(run_cells.LAMBDA_POTTS[prot]) == sweep_dcn.LAMBDA[
            (prot, "potts")]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # run_r4_evidence.sh: declare -A LAMBDA_POTTS=( [<prot>]=<lam> ... )
    sh = open(os.path.join(repo, "scripts", "run_r4_evidence.sh")).read()
    found = {p: float(l) for p, l in
             re.findall(r"\[([\w.-]+)\]=([0-9.]+)", sh)
             if (p, "potts") in sweep_dcn.LAMBDA}
    assert len(found) == 3, "run_r4_evidence.sh no longer states lambdas"
    for prot, lam in found.items():
        assert lam == sweep_dcn.LAMBDA[(prot, "potts")], (
            f"run_r4_evidence.sh lambda for {prot} ({lam}) disagrees with "
            f"sweep_dcn.LAMBDA ({sweep_dcn.LAMBDA[(prot, 'potts')]})")

    # run_r4_family_cells.sh: declare -A LAMBDA=([$PABP]=5 [$UBE4B]=3 ...)
    # with $SHORT-name vars defined at the top — published transformer λ
    fam = open(os.path.join(repo, "scripts",
                            "run_r4_family_cells.sh")).read()
    short_to_prot = dict(re.findall(r"^(\w+)=(\w[\w.-]+)$", fam, re.M))
    tl = {short_to_prot[s]: float(l) for s, l in
          re.findall(r"\[\$(\w+)\]=([0-9.]+)", fam) if s in short_to_prot}
    assert len(tl) == 3, "run_r4_family_cells.sh no longer states lambdas"
    for prot, lam in tl.items():
        assert lam == sweep_dcn.LAMBDA[(prot, "transformer-M")], (
            f"run_r4_family_cells.sh transformer lambda for {prot} ({lam}) "
            "disagrees with sweep_dcn.LAMBDA "
            f"({sweep_dcn.LAMBDA[(prot, 'transformer-M')]})")
