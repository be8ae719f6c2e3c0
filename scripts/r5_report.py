"""Collate results/r5_*.log (+ r4 carryovers) into the round-5 STATUS tables.

Tables produced:
  1. paged vs slot at 32L (bs 1/4/16) — VERDICT r3 #2 closure
  2. long-context ladder (in 4k/16k, slot + paged, + matched-12L bf16 ratio)
  3. bs=64 repeats re-measure with the 8L matched-depth ratio
Every row carries the median with [min-max] spread (repeats protocol).

Run: python scripts/r5_report.py
"""

import glob
import json
import os


def rows(pattern):
    out = []
    for path in sorted(glob.glob(pattern)):
        for line in open(path):
            if line.startswith("{"):
                try:
                    r = json.loads(line)
                    r["_file"] = os.path.basename(path)
                    out.append(r)
                except json.JSONDecodeError:
                    pass
    return out


def spread(r):
    if r.get("repeats", 1) > 1:
        return (f"{r['out_tok_s']:.1f} "
                f"[{r['out_tok_s_min']:.1f}-{r['out_tok_s_max']:.1f}]")
    return f"{r['out_tok_s']:.1f}"


def fmt(r, paged):
    ttft = r.get("ttft_p50_s")
    tpot = r.get("tpot_p50_ms")
    return (f"| {r['mode']}{' paged' if paged else ''} | {r['layers']} "
            f"| {r['bs']} | {r['in']} | {spread(r)} "
            f"| {ttft if ttft is not None else '—'} "
            f"| {tpot if tpot is not None else '—'} |")


def main():
    allr = rows("results/r5_*.log") + rows("results/r4_*.log")
    print("### paged vs slot, 32L, in 1024 / out 128\n")
    print("| config | layers | bs | in | out tok/s (med [min-max]) "
          "| TTFT p50 s | TPOT p50 ms |")
    print("|---|---|---|---|---|---|---|")
    for r in allr:
        if r["in"] == 1024 and r["layers"] == 32:
            print(fmt(r, "paged" in r["_file"]))
    print("\n### long-context ladder (out 128)\n")
    print("| config | layers | bs | in | out tok/s (med [min-max]) "
          "| TTFT p50 s | TPOT p50 ms |")
    print("|---|---|---|---|---|---|---|")
    for r in allr:
        if r["in"] in (4096, 16384):
            print(fmt(r, "paged" in r["_file"]))
    print("\n### bs=64 repeats re-measure (8L matched depth)\n")
    print("| config | layers | bs | in | out tok/s (med [min-max]) "
          "| TTFT p50 s | TPOT p50 ms |")
    print("|---|---|---|---|---|---|---|")
    w = b = None
    for r in allr:
        if r["bs"] == 64:
            print(fmt(r, "paged" in r["_file"]))
            if r["mode"] == "w4a8":
                w = r
            else:
                b = r
    if w and b:
        lo = w["out_tok_s_min"] / b["out_tok_s_max"]
        hi = w["out_tok_s_max"] / b["out_tok_s_min"]
        print(f"\nmatched-8L bs=64 ratio: "
              f"{w['out_tok_s'] / b['out_tok_s']:.3f}x "
              f"(spread {lo:.3f}-{hi:.3f}; reference target 1.15x)")

    # matched-12L long-context ratio
    w12 = [r for r in allr if r["layers"] == 12 and r["in"] == 4096
           and r["mode"] == "w4a8"]
    b12 = [r for r in allr if r["layers"] == 12 and r["in"] == 4096
           and r["mode"] == "bf16"]
    if w12 and b12:
        print(f"\nmatched-12L in=4096 bs=1 ratio: "
              f"{w12[0]['out_tok_s'] / b12[0]['out_tok_s']:.3f}x")


if __name__ == "__main__":
    main()
