"""Collate results/ladder2_*.log into the reference-protocol speedup table.

Pairs same-layer-count w4a8/g128 rows with their bf16 rows (the ratio is
layer-count invariant up to the constant lm_head/sampling term — see
bench_serving.py memory notes) and prints a markdown table plus one JSON
line per (config, bs).

Run: python scripts/ladder_report.py [results_dir]
"""

import glob
import json
import os
import sys


def load(results):
    rows, seen = [], set()
    for path in glob.glob(os.path.join(results, "ladder2_*.log")):
        if "driver" in path:  # the driver log echoes each config's tail
            continue
        for line in open(path):
            if line.startswith("{") and line not in seen:
                seen.add(line)
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def main():
    results = sys.argv[1] if len(sys.argv) > 1 else "results"
    rows = load(results)
    key = lambda r: (r["layers"], r["bs"], r["in"], r["out"])
    bf16 = {key(r): r for r in rows if r["mode"] == "bf16"}
    ref = {  # BASELINE.md §E2E, LLaMA-2-7B (A100)
        (-1, 1): 1.85, (-1, 4): 1.65, (-1, 16): 1.38, (-1, 64): 1.15,
        (128, 1): 1.75, (128, 4): 1.53, (128, 16): 1.25, (128, 64): 1.04,
    }
    print("| config | bs | layers | w4a8 out tok/s | bf16 out tok/s "
          "| speedup | reference |")
    print("|---|---|---|---|---|---|---|")
    out = []
    for r in sorted(
        (r for r in rows if r["mode"] == "w4a8" and not r.get("paged")),
        key=lambda r: (r["group_size"], r["bs"], -r["layers"]),
    ):
        b = bf16.get(key(r))
        cfg = "per-channel" if r["group_size"] == -1 else "g128"
        sp = r["out_tok_s"] / b["out_tok_s"] if b else None
        print(f"| {cfg} | {r['bs']} | {r['layers']} | {r['out_tok_s']:.1f} "
              f"| {b['out_tok_s']:.1f}" if b else
              f"| {cfg} | {r['bs']} | {r['layers']} | {r['out_tok_s']:.1f} "
              f"| —", end="")
        rv = ref.get((r["group_size"], r["bs"]))
        print(f" | {sp:.2f}× | {rv}× |" if sp else f" | — | {rv}× |")
        if sp:
            out.append({
                "config": cfg, "bs": r["bs"], "layers": r["layers"],
                "w4a8_tok_s": r["out_tok_s"], "bf16_tok_s": b["out_tok_s"],
                "speedup": round(sp, 3), "reference_speedup": rv,
            })
    for o in out:
        print(json.dumps(o))


if __name__ == "__main__":
    main()
