"""Per-step source attribution of a jax.profiler chrome trace.

Usage: python tools/trace_slices.py artifacts/trace_esrgan_otf_r4 [n_steps]

Groups every device HLO event's `device_duration_ps` by its `source`
(file:line) and by the jit scope prefix of `tf_op`, divides by the number
of timed steps, and prints the two tables that drive the BENCH_NOTES
per-slice breakdowns.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def load_events(trace_dir: str) -> list[dict]:
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        msg = f"no trace.json.gz under {trace_dir}"
        raise SystemExit(msg)
    return json.load(gzip.open(sorted(paths)[-1]))["traceEvents"]


def main() -> None:
    trace_dir = sys.argv[1]
    events = load_events(trace_dir)
    if len(sys.argv) > 2:
        n_steps = int(sys.argv[2])
    else:
        # count the bare-integer per-step envelope spans
        n_steps = sum(
            1 for e in events
            if e.get("ph") == "X" and e.get("name", "x").isdigit()
            and "device_duration_ps" in (e.get("args") or {})
        ) or 10

    by_source: collections.Counter = collections.Counter()
    by_scope: collections.Counter = collections.Counter()
    by_category: collections.Counter = collections.Counter()
    total = 0
    for e in events:
        args = e.get("args")
        if e.get("ph") != "X" or not args or "device_duration_ps" not in args:
            continue
        # Skip ENVELOPE spans (the jit_<fn>(fingerprint) program span and
        # the bare-integer per-step spans): they wrap the leaf HLO events
        # and previously double-counted ~2/3 of "device total" into the
        # "?" bucket (round-4's unattributed 75%).  A leaf always carries
        # source/tf_op/hlo_category; envelopes carry none of them.
        if ("source" not in args and "tf_op" not in args
                and "hlo_category" not in args):
            continue
        dur_ms = int(args["device_duration_ps"]) / 1e9
        total += dur_ms
        src = args.get("source", "?")
        by_source[src.replace("/root/repo/", "")] += dur_ms
        tf_op = args.get("tf_op", "?")
        # scope prefix: jit(fused)/jvp(esrgan)/... -> first two path parts
        by_scope["/".join(tf_op.split("/")[:2])] += dur_ms
        by_category[args.get("hlo_category", "?")] += dur_ms

    print(f"device total: {total:.1f} ms over {n_steps} steps "
          f"= {total / n_steps:.2f} ms/step\n")
    print("-- by source (ms/step) --")
    for src, d in by_source.most_common(25):
        print(f"{d / n_steps:8.2f}  {src}")
    print("\n-- by jit scope (ms/step) --")
    for sc, d in by_scope.most_common(15):
        print(f"{d / n_steps:8.2f}  {sc}")
    print("\n-- by hlo category (ms/step) --")
    for c, d in by_category.most_common(15):
        print(f"{d / n_steps:8.2f}  {c}")


if __name__ == "__main__":
    main()
