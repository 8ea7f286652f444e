"""Size/order sweep of the FOM benchmark (BENCH_SWEEP_r*.json producer).

Runs bench.py across N x p grid points (f32, mass/bounds-verified; the
f32-vs-f64 state cross-check runs once at the headline point), collects
the JSON lines, and writes a single sweep record with the throughput
plateau identified. Wall budget: each point compiles its own program
(~2-5 min on the remote helper), so the default grid is 6 points.

Usage: python tools/sweep.py [out.json]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRID = [(16, 3), (24, 3), (32, 3), (16, 4), (24, 4), (32, 4)]


def run_point(n, p, crosscheck):
    env = dict(os.environ)
    env.update(BENCH_N=str(n), BENCH_P=str(p), BENCH_DUAL="0",
               BENCH_PHASES="0", BENCH_P4="0",
               BENCH_CROSSCHECK="1" if crosscheck else "0")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True)
    rec = None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
    if rec is None:
        print(f"point N={n} p={p} FAILED:\n{out.stderr[-1500:]}",
              file=sys.stderr)
        return None
    rec["n"] = n
    rec["p"] = p
    return rec


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SWEEP.json"
    points = []
    for n, p in GRID:
        rec = run_point(n, p, crosscheck=(n == 24 and p == 3))
        if rec:
            points.append(rec)
            print(json.dumps({k: rec.get(k) for k in
                              ("n", "p", "ndofs", "value", "mass_rel_loss",
                               "hbm_util")}), flush=True)
    if points:
        best = max(points, key=lambda r: r["value"])
        plateau = [r for r in points
                   if r["value"] >= 0.9 * best["value"]]
        summary = {
            "metric": "fom_sweep_3d_remap_pa_f32",
            "unit": "MDOF*stages/s",
            "points": points,
            "best": {k: best[k] for k in ("n", "p", "ndofs", "value")},
            "plateau_ndofs_min": min(r["ndofs"] for r in plateau),
        }
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
        print(f"wrote {out_path}: best {best['value']} at N={best['n']} "
              f"p={best['p']}")


if __name__ == "__main__":
    main()
