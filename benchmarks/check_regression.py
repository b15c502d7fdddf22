"""Per-round benchmark regression gate (VERDICT r3 #5).

`run_all.py --record rN` archives one JSON row per config to
benchmarks/records/BENCH_cfg{K}_rN.json. This script compares the newest
tag against the previous one and FAILS (exit 1) if any config's throughput
drops more than --tol (default 10%) at equal-or-better convergence — a
throughput drop that buys convergence is reported but not gated (the two
are a legitimate trade; a drop in BOTH is always a failure).

Usage:
    python benchmarks/check_regression.py             # newest vs previous
    python benchmarks/check_regression.py r3 r4       # explicit pair
    python benchmarks/check_regression.py --tol 0.05

Intended for the TPU bench runner right after `run_all.py --record`; it is
pure file comparison (no jax import) so it also runs in CPU-only CI as a
record-format check.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

RECORD_DIR = os.path.join(os.path.dirname(__file__), "records")


def _tags():
    """Recorded tags ordered oldest -> newest (rN sorts numerically; other
    tags sort lexically after the rN family)."""
    tags = set()
    for p in glob.glob(os.path.join(RECORD_DIR, "BENCH_cfg*_*.json")):
        m = re.match(r"BENCH_cfg\d+_(.+)\.json$", os.path.basename(p))
        if m:
            tags.add(m.group(1))

    def key(t):
        m = re.fullmatch(r"r(\d+)", t)
        return (0, int(m.group(1)), "") if m else (1, 0, t)

    return sorted(tags, key=key)


def _load(tag):
    rows = {}
    for p in glob.glob(os.path.join(RECORD_DIR, f"BENCH_cfg*_{tag}.json")):
        m = re.match(r"BENCH_cfg(\d+)_", os.path.basename(p))
        with open(p) as f:
            rows[int(m.group(1))] = json.load(f)
    return rows


def _convergence(row):
    """Comparable convergence fraction, or None for configs that don't
    report one (config 1 single solve, config 4 MPC)."""
    if "frac_converged" in row:
        return float(row["frac_converged"])
    if "n_converged" in row:
        return None  # absolute count; batch may differ between quick/full
    return None


def check(prev_tag, new_tag, tol):
    prev, new = _load(prev_tag), _load(new_tag)
    failures, notes = [], []
    for cfg in sorted(set(prev) & set(new)):
        p, n = prev[cfg], new[cfg]
        if p.get("quick") != n.get("quick"):
            notes.append(f"cfg{cfg}: quick-flag mismatch, skipped")
            continue
        # DEVICE-side fields gate when both records carry them (r5+:
        # chunk-slope rates are tunnel-independent, so the 10% tolerance
        # finally measures the chip, not the remote link — VERDICT r4 #4).
        # MPC records gate on the device per-tick cost (lower = better).
        if (
            p.get("device_per_tick_ms") is not None
            and n.get("device_per_tick_ms") is not None
        ):
            ratio = float(p["device_per_tick_ms"]) / float(
                n["device_per_tick_ms"]
            )
            line = (
                f"cfg{cfg}: device/tick {p['device_per_tick_ms']:.3f} -> "
                f"{n['device_per_tick_ms']:.3f} ms "
                f"({100 * (1 / ratio - 1):+.1f}%)"
            )
            if ratio < 1.0 - tol:
                failures.append(line + "  [REGRESSION]")
            else:
                notes.append(line)
            continue
        gate_field, unit = "value", n["unit"]
        if (
            p.get("device_rate") is not None
            and n.get("device_rate") is not None
        ):
            gate_field, unit = "device_rate", "device solves/s"
        elif (
            n.get("dispatch_intercept_ms") is not None
            and n.get("p50_latency_ms") is not None
            and float(n["dispatch_intercept_ms"])
            > 0.5 * float(n["p50_latency_ms"])
        ):
            # the wall number is MOSTLY tunnel intercept and the previous
            # record has no device-side field to gate against (pre-r5
            # baseline): a wall comparison would gate the remote link, not
            # the chip (the documented r3 config-2 false alarm). Report
            # only; the r5+ records carry device_rate so the NEXT pair
            # gates chip-side.
            ratio = float(n["value"]) / float(p["value"])
            notes.append(
                f"cfg{cfg}: {p['value']:.1f} -> {n['value']:.1f} "
                f"{n['unit']} ({100 * (ratio - 1):+.1f}%)  "
                "[tunnel-dominated wall, legacy baseline without "
                "device_rate — not gated; device-side gating starts "
                "next round]"
            )
            continue
        ratio = float(n[gate_field]) / float(p[gate_field])
        # dispatch-floor-bound configs (the MPC loop: per-dispatch p50 IS
        # the ~27 ms tunnel round trip) measure the remote link, not the
        # chip — measured 1.8-2.5 kHz run-to-run on IDENTICAL code, and
        # the stable number lives in benchmarks/mpc_device_loop.py
        # (device per-tick latency). Report, never gate.
        if "per_dispatch_ms" in n:
            notes.append(
                f"cfg{cfg}: {p['value']:.1f} -> {n['value']:.1f} "
                f"{n['unit']} ({100 * (ratio - 1):+.1f}%)  "
                "[tunnel-bound, not gated — device cert: mpc_device_loop]"
            )
            continue
        pc, nc = _convergence(p), _convergence(n)
        # a throughput drop is gated UNLESS convergence strictly improved
        # (the legitimate trade); a drop in both always fails
        conv_improved = (
            pc is not None and nc is not None and nc > pc + 1e-3
        )
        line = (
            f"cfg{cfg}: {float(p[gate_field]):.1f} -> "
            f"{float(n[gate_field]):.1f} {unit} "
            f"({100 * (ratio - 1):+.1f}%)"
        )
        if pc is not None and nc is not None:
            line += f", converged {100 * pc:.2f}% -> {100 * nc:.2f}%"
        if ratio < 1.0 - tol and not conv_improved:
            failures.append(line + "  [REGRESSION]")
        elif ratio < 1.0 - tol:
            notes.append(line + "  [slower but convergence improved]")
        else:
            notes.append(line)
    for line in notes:
        print(line)
    for line in failures:
        print(line, file=sys.stderr)
    return not failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tags", nargs="*", help="prev new (default: latest two)")
    ap.add_argument("--tol", type=float, default=0.10)
    args = ap.parse_args()
    if len(args.tags) == 2:
        prev_tag, new_tag = args.tags
    elif not args.tags:
        tags = _tags()
        if len(tags) < 2:
            print(f"need two recorded tags, have {tags}; nothing to gate")
            return 0
        prev_tag, new_tag = tags[-2], tags[-1]
    else:
        ap.error("pass zero or two tags")
    print(f"gate: {prev_tag} -> {new_tag} (tol {args.tol:.0%})")
    return 0 if check(prev_tag, new_tag, args.tol) else 1


if __name__ == "__main__":
    sys.exit(main())
