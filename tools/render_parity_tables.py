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

SPREAD_HEADER = ("| cell (n seeds) | diversity % | exploration mean |"
                 " oracle logfit p50 | oracle logfit p100 |")
SPREAD_RULE = "|---|---|---|---|---|"


def _mean_spread(vals: list[float]) -> str:
    """mean ± half-range across seeds (the spread a reader checks a single
    seed against; sample std is noisy at n=4 and overstates agreement when
    one seed is an outlier)."""
    m = sum(vals) / len(vals)
    half = (max(vals) - min(vals)) / 2
    return f"{m:.2f} ± {half:.2f}"


# a seed-spread group must agree on everything BUT the seed; these are the
# config fields the cell summaries carry (scripts/directed_evolution.py)
_SPREAD_CONFIG_KEYS = ("n_iters", "n_chains", "energy_function",
                       "unsupervised_expert", "energy_lamda",
                       "nmut_threshold", "reference_reverse")


def seed_spread_tables(by_protein: dict) -> None:
    """Aggregate cells that differ ONLY in seed into mean ± half-range rows.

    Mirrors the reference's seed-spread presentation (its Tables 1-2 are
    means over seeded runs of scripts/run_ppde_protein_exps.sh); a PARITY
    spread row is auditable back to each member cell via the sources list.
    Cells sharing (sampler, run_signature) but differing in any other
    config field, and duplicate seeds (e.g. the same cell present in two
    --summaries dirs), would publish a spread no single configuration
    produced: those groups are SKIPPED with a loud stderr note and the
    process exits nonzero, but the clean groups still render (a half-
    upgraded grid — e.g. mid 2500→10000-iter re-run — must not block the
    tables for every other protein).
    """
    import sys
    bad = 0
    for prot in sorted(by_protein):
        groups: dict[tuple, list[dict]] = {}
        for s in by_protein[prot]:
            groups.setdefault((s["sampler"], s.get("run_signature", "")),
                              []).append(s)
        rows = {k: v for k, v in groups.items() if len(v) > 1}
        for (sampler, sig), cells in sorted(rows.items()):
            seeds = [c["seed"] for c in cells]
            problems = []
            if len(set(seeds)) != len(seeds):
                problems.append(
                    f"duplicate seeds {seeds} — the same cell appears in "
                    "more than one summaries dir")
            for key in _SPREAD_CONFIG_KEYS:
                vals = {c.get(key) for c in cells}
                if len(vals) > 1:
                    problems.append(f"members disagree on {key} "
                                    f"({sorted(map(str, vals))})")
            if problems:
                bad += 1
                del rows[(sampler, sig)]
                print(f"seed spread {prot}/{sampler}/{sig}: SKIPPED — "
                      + "; ".join(problems) + " — sources: "
                      + str([c['_path'] for c in cells]), file=sys.stderr)
        if not rows:
            continue
        print(f"\n### {prot} — seed spread\n\n{SPREAD_HEADER}\n{SPREAD_RULE}")
        for (sampler, sig), cells in sorted(rows.items()):
            o = [c["oracle_logfit"] for c in cells]
            print(f"| {sampler}/{sig} (n={len(cells)}) | "
                  + _mean_spread([c["diversity_pct"] for c in cells]) + " | "
                  + _mean_spread([c["exploration_mean"] for c in cells])
                  + " | " + _mean_spread([x["p50"] for x in o]) + " | "
                  + _mean_spread([x["p100"] for x in o]) + " |")
        print("\nsources:")
        for (sampler, sig), cells in sorted(rows.items()):
            for c in sorted(cells, key=lambda s: str(s["seed"])):
                print(f"  {sampler}/{sig}/s{c['seed']}: {c['_path']}")
    if bad:
        raise SystemExit(f"{bad} inconsistent seed-spread group(s) skipped")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--summaries", nargs="*", default=[
        "results/proteins/summaries", "results/esm_family"])
    ap.add_argument("--mnist", nargs="*", default=[
        "results/mnist/r4full_summary.json",
        "results/mnist/r4refcfg_summary.json"])
    ap.add_argument("--seed_spread", action="store_true",
                    help="emit ONLY mean ± half-range rows aggregated over "
                         "cells that differ only in seed")
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

    if args.seed_spread:
        seed_spread_tables(by_protein)
        return

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
