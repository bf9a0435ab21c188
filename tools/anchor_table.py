"""Extract the validation trajectory + final/best metrics from a training
log into a markdown table row (for BENCH_NOTES / anchors README records).

Usage: python tools/anchor_table.py <train_log> [...]
"""

from __future__ import annotations

import re
import sys


def parse_log(path: str) -> dict:
    text = open(path, encoding="utf-8", errors="replace").read()
    iters = [int(m.group(1).replace(",", ""))
             for m in re.finditer(r"iter:\s*([\d,]+)", text)]
    vals = re.findall(
        r"# psnr: ([\d.]+)\s+Best: ([\d.]+) @ (\d+) iter\s*\n\s*# ssim: "
        r"([\d.]+)\s+Best: ([\d.]+) @ (\d+) iter", text)
    rows = [(float(p), float(s)) for p, bp, bi, s, bs, bsi in vals]
    best = None
    if vals:
        last = vals[-1]
        best = {"psnr": float(last[1]), "psnr_iter": int(last[2]),
                "ssim": float(last[4]), "ssim_iter": int(last[5])}
    return {
        "last_iter": max(iters) if iters else 0,
        "n_vals": len(rows),
        "vals": rows,
        "final": rows[-1] if rows else None,
        "best": best,
    }


def main() -> None:
    for path in sys.argv[1:]:
        r = parse_log(path)
        print(f"== {path}")
        print(f"   last iter {r['last_iter']}, {r['n_vals']} validations")
        if r["final"]:
            print(f"   final PSNR/SSIM: {r['final'][0]:.4f} / {r['final'][1]:.4f}")
        if r["best"]:
            b = r["best"]
            print(f"   best : {b['psnr']:.4f} @ {b['psnr_iter']} / "
                  f"{b['ssim']:.4f} @ {b['ssim_iter']}")
        if r["vals"]:
            traj = " ".join(f"{p:.2f}" for p, _ in r["vals"])
            print(f"   psnr trajectory: {traj}")


if __name__ == "__main__":
    main()
