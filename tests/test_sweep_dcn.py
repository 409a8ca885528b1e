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
         "--num_hosts", "4", "--host_id", "1"],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 0
    assert "host 1/4" in p.stdout
    # 21 cells (3 proteins x 7 samplers) over 4 hosts -> 5 or 6 per host
    assert "of 21 cells" in p.stdout
