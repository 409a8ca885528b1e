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
