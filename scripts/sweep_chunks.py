"""Crash-resilient wrapper around scripts/gate_sweep.py: runs the full
oracle-checked query list in chunks, each in a FRESH subprocess (fresh
Ray session), retrying a chunk once on a nonzero exit.

Why: the sandbox's Ray occasionally dies mid-sweep with an internal
raylet race (`task_manager.cc: Tried to complete task that was not
pending`) when a single session executes hundreds of Datasets back to
back. That is a Ray-internal bug, not repo code — but a monolithic
sweep loses all progress when it fires. Chunking bounds the blast
radius to one chunk and the retry absorbs it.

Usage: python scripts/sweep_chunks.py [sf_dir] [start_index] [chunk_size]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    chunk_size = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    sys.path.insert(0, REPO)
    import __ray_entry__ as e

    names = [k for k in e.queries() if k in e.oracle_sql()]
    print(f"{len(names)} oracle-checked queries, chunk={chunk_size}")
    results, total_ok, total_bad = {}, 0, 0
    for i in range(start, len(names), chunk_size):
        chunk = names[i:i + chunk_size]
        ok, bad = [], []
        for attempt in (1, 2):
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts/gate_sweep.py"),
                 sf, *chunk],
                cwd=REPO, capture_output=True, text=True, timeout=3600,
            )
            ok = [ln for ln in p.stdout.splitlines() if ": ok" in ln]
            bad = [ln for ln in p.stdout.splitlines()
                   if any(m in ln for m in
                          (": COLS", ": ROWS", ": VALUES", ": ERROR"))]
            print(f"chunk {i}-{i + len(chunk)} attempt {attempt}: "
                  f"rc={p.returncode} ok={len(ok)} bad={len(bad)}")
            for ln in bad:
                print("  BAD:", ln)
            # rc!=0 with every query accounted for means real failures,
            # not a crash — no point retrying those
            if p.returncode == 0 or (len(ok) + len(bad)) == len(chunk):
                break
            print("  crash, retrying; stderr tail:", p.stderr[-200:])
        results[i] = {"ok": len(ok), "bad": len(bad), "rc": p.returncode}
        total_ok += len(ok)
        total_bad += len(bad)
    print(json.dumps(results))
    print(f"SWEEP {'FAIL' if total_bad else 'PASS'} "
          f"ok={total_ok} bad={total_bad}")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
