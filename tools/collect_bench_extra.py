"""Collect the JSON lines of a bench_extra sweep log into
BENCH_EXTRA_r{N}.json (one artifact per round, read by the judge
alongside BENCH_r{N}.json).

Usage: python tools/collect_bench_extra.py <sweep.log> <round>
"""
import json
import sys


def main(log_path, round_no):
    rows = []
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    out = f"BENCH_EXTRA_r{int(round_no):02d}.json"
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"{out}: {len(rows)} metrics")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
