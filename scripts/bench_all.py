"""One-command BASELINE regeneration (VERDICT.md round 4, task 5).

BASELINE.md carries ~20 measured claims; the driver's nightly run covers only
``bench.py``, so regressions in the non-headline rows (the batched M=7
record, the 19.3 ms/gen fused eval, the w+ recipes, the two-phase pipeline)
were previously invisible. This script re-runs every measured row's bench at
its RECORDED config (SURVEY.md §6's benchmark-config table), each in a fresh
subprocess (clean TPU state — a worker fault in one bench must not poison
the rest), parses each ONE-JSON-line contract output, and writes the bundle
as JSON lines to ``BENCH_ALL.jsonl`` (one object per row + a final summary
object). BASELINE.md cites this artifact.

Usage:
    python scripts/bench_all.py            # every row (~25-35 min on chip)
    python scripts/bench_all.py --quick    # headline + batched record +
                                           # eval-only (~8 min)
    python scripts/bench_all.py --only headline wplus
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# row name -> (argv, timeout_s, in_quick_subset)
ROWS = {
    # the driver-contract headline: BigGAN-256 BasinCMA bf16 fused
    "headline": ([sys.executable, "bench.py"], 2400, True),
    # batched multi-image record config (M=7 plain = 490.2 img/s round 4)
    # plus the chunking plateau config (M=14, mbs=126 exact divisor)
    "batched_knee": ([sys.executable, "scripts/bench_batched_knee.py",
                      "--ms", "7", "14", "--mbs", "0", "126"], 3600, True),
    # eval-only host-vs-fused adjudication (19.3 / 19.6 ms/gen fused)
    "evalonly": ([sys.executable, "scripts/bench_evalonly.py"], 2400, True),
    # StyleGAN2-cars-512 BasinCMA (226 img/s bf16)
    "stylegan2": ([sys.executable, "bench_stylegan2.py"], 2400, False),
    # w+ search recipes (LMMAES / DiagonalCMA / Adam)
    "wplus": ([sys.executable, "bench_wplus.py"], 3600, False),
    # transform search, solo + batched M sweep
    "transform": ([sys.executable, "bench_transform.py"], 3600, False),
    # full-inversion wall-clock (warm 65.1 s round 2)
    "full_inversion": ([sys.executable, "scripts/bench_full_inversion.py"],
                       2400, False),
    # the paper's signature two-phase pipeline, all three legs
    "two_phase": ([sys.executable, "scripts/bench_two_phase.py"], 4800,
                  False),
    # composed spatial+color search recovering a known hue+shift corruption
    "color_transform": ([sys.executable, "scripts/bench_color_transform.py"],
                        2400, False),
}


def run_row(name, argv, timeout_s):
    """Run one bench subprocess; return its parsed last-JSON-line (the
    ONE-JSON-line bench contract) or an error record."""
    t0 = time.time()
    try:
        proc = subprocess.run(argv, cwd=REPO, capture_output=True,
                              text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"row": name, "error": f"timeout after {timeout_s}s"}
    wall = round(time.time() - t0, 1)
    parsed = None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if proc.returncode != 0 or parsed is None:
        tail = (proc.stdout + "\n" + proc.stderr).strip().splitlines()[-8:]
        return {"row": name, "error": f"rc={proc.returncode}, "
                                      f"json_found={parsed is not None}",
                "tail": tail, "bench_wall_s": wall}
    parsed["row"] = name
    parsed["bench_wall_s"] = wall
    return parsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="headline + batched record + eval-only only")
    ap.add_argument("--only", nargs="*", default=None,
                    help=f"subset of rows: {sorted(ROWS)}")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_ALL.jsonl"))
    args = ap.parse_args()

    names = list(ROWS)
    if args.only:
        unknown = set(args.only) - set(ROWS)
        assert not unknown, f"unknown rows {sorted(unknown)}"
        names = [n for n in names if n in set(args.only)]
    elif args.quick:
        names = [n for n in names if ROWS[n][2]]

    results = []
    for name in names:
        argv, timeout_s, _ = ROWS[name]
        print(f"[bench_all] running {name}: {' '.join(argv[1:])}",
              flush=True)
        rec = run_row(name, argv, timeout_s)
        results.append(rec)
        status = "ERROR " + rec["error"] if "error" in rec else (
            f"{rec.get('value')} {rec.get('unit', '')}")
        print(f"[bench_all] {name}: {status}", flush=True)

    ok = [r for r in results if "error" not in r]
    summary = {
        "row": "__summary__",
        "rows_run": len(results),
        "rows_ok": len(ok),
        "failed": [r["row"] for r in results if "error" in r],
        "total_wall_s": round(sum(r.get("bench_wall_s", 0.0)
                                  for r in results), 1),
    }
    with open(args.out, "w") as f:
        for rec in results + [summary]:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(summary))
    if summary["failed"]:
        raise SystemExit(f"bench rows failed: {summary['failed']}")


if __name__ == "__main__":
    main()
