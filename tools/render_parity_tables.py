"""Render PARITY.md's sweep tables from the committed cell summaries.

Every number in PARITY.md's protein tables must resolve to a tracked file
(round-3 verdict: prose-only evidence is one environment wipe from
unverifiable). This tool is the inverse direction: given the committed
`results/proteins/summaries/*.json` + `results/esm_family/*_s*.json`
cell summaries (written by scripts/directed_evolution.py --summary_json),
print the markdown tables, so PARITY.md content is mechanically
regenerable and checkable:

  python tools/render_parity_tables.py [--summaries DIR ...]

A cell summary's provenance fields (protein/sampler/seed/config/
potts_provenance) ride along, so a table line is auditable back to the
producing command without the run directory.
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def fmt_cell(s: dict) -> list[str]:
    o = s["oracle_logfit"]
    row = [
        f'{s["diversity_pct"]:.1f}',
        f'{s["exploration_mean"]:.2f} ± {s["exploration_std"]:.2f}',
        f'{o["p50"]:.2f} ({o["p100"]:.2f})',
    ]
    d = s.get("evolutionary_density")
    row.append(f'{d["p50"]:.1f} ({d["p100"]:.1f})' if d else "—")
    row.append(f'{s["steps_per_sec"]:.1f}')
    return row


def label(s: dict) -> str:
    bits = [s["sampler"]]
    if s.get("run_signature"):
        bits.append(s["run_signature"])
    bits.append(f's{s["seed"]}')
    return "/".join(bits)


HEADER = ("| cell | diversity % | exploration | oracle logfit p50 (p100) |"
          " evo-density p50 (p100) | steps/s |")
RULE = "|---|---|---|---|---|---|"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--summaries", nargs="*", default=[
        "results/proteins/summaries", "results/esm_family"])
    ap.add_argument("--mnist", nargs="*", default=[
        "results/mnist/r4full_summary.json",
        "results/mnist/r4refcfg_summary.json"])
    args = ap.parse_args()

    by_protein: dict[str, list[dict]] = {}
    for d in args.summaries:
        for p in sorted(glob.glob(os.path.join(d, "*.json"))):
            with open(p) as f:
                s = json.load(f)
            if not isinstance(s, dict) or "diversity_pct" not in s:
                continue  # corr/eval JSONs live alongside the cell summaries
            s["_path"] = p
            by_protein.setdefault(s["protein"], []).append(s)

    for prot in sorted(by_protein):
        print(f"\n### {prot}\n\n{HEADER}\n{RULE}")
        cells = sorted(by_protein[prot],
                       key=lambda s: (s["sampler"], s.get("run_signature",
                                                          ""), s["seed"]))
        for s in cells:
            print(f'| {label(s)} | ' + " | ".join(fmt_cell(s)) + " |")
        print("\nsources:")
        for s in cells:
            print(f"  {label(s)}: {s['_path']}")

    for mpath in args.mnist:
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            rows = json.load(f)  # list of row dicts (summarize_mnist_runs)
        if not isinstance(rows, list) or not rows:
            continue
        print(f"\n### MNIST matrix — {mpath}\n")
        cols = [c for c in ("diversity_pct", "ink_fraction",
                            "oracle_final", "ebm_logp_mean",
                            "ebm_logp_std", "final_step")
                if any(c in r for r in rows)]
        print("| run | " + " | ".join(cols) + " |")
        print("|" + "---|" * (len(cols) + 1))
        for r in sorted(rows, key=lambda r: r.get("run", "")):
            print(f'| {r.get("run", "?")} | ' + " | ".join(
                str(r.get(c, "—")) for c in cols) + " |")


if __name__ == "__main__":
    main()
