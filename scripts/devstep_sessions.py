"""Cross-session devstep attribution (VERDICT r4 task 4).

The per-component decode-step decomposition (`bench.py devstep`)
medians paired ablation slopes WITHIN one process, but the attribution
still drifted across sessions (logits 122 vs 187 µs between the r3
and r4 ledgers; attention 81 vs 95% of floor) — a fresh tunnel session
re-rolls compile placement and link behavior. This runs N independent
devstep SESSIONS (fresh process each, the unit that drifts) and
reports the per-component median-of-sessions as THE authoritative
attribution, with the per-session spread printed so the stability
claim is checkable.

Usage: python scripts/devstep_sessions.py [--sessions 3] [--rounds 3]
Prints every session's JSON line, then one aggregate JSON object.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sessions", type=int, default=3)
    parser.add_argument("--rounds", type=int, default=3)
    args = parser.parse_args()

    sessions = []
    for s in range(args.sessions):
        env = dict(
            os.environ,
            BENCH_DEVSTEP_ROUNDS=str(args.rounds),
            BENCH_WATCHDOG_S=os.environ.get("BENCH_WATCHDOG_S", "1800"),
        )
        out = subprocess.run(
            [sys.executable, "bench.py", "devstep"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=2400,
        )
        line = [
            ln for ln in out.stdout.splitlines()
            if ln.startswith("{") and "components" in ln
        ]
        if not line:
            print(f"session {s}: NO RESULT\n{out.stdout}\n{out.stderr}",
                  flush=True)
            continue
        data = json.loads(line[-1])
        sessions.append(data)
        comp = {
            k: v["us"] for k, v in data["components"].items()
        }
        print(
            f"session {s}: full {data['value']} us/step, {comp}",
            flush=True,
        )

    if not sessions:
        print(json.dumps({"error": "no sessions completed"}))
        return 1

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    names = list(sessions[0]["components"].keys())
    agg = {"sessions": len(sessions), "rounds_per_session": args.rounds}
    agg["full_us"] = {
        "median": med([s["value"] for s in sessions]),
        "per_session": [s["value"] for s in sessions],
    }
    agg["components"] = {}
    for name in names:
        vals = [s["components"][name]["us"] for s in sessions]
        floor = sessions[0]["components"][name]["floor_us"]
        m = med(vals)
        agg["components"][name] = {
            "median_us": m,
            "per_session_us": vals,
            "floor_us": floor,
            "pct_of_floor": round(100.0 * floor / m, 1) if m else None,
        }
    print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    sys.exit(main())
